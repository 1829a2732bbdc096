#!/usr/bin/env python3
"""Randomized differential conformance testbench (checkout wrapper).

Canonical implementation: ldpc_3gpp_tpu/cli.py::testbench_main — installed
as the ``ldpc-testbench`` console command (pyproject).  This wrapper keeps
the historical ``python tools/testbench.py`` invocation working from a
plain checkout.

Usage:  python tools/testbench.py [--trials N] [--seed S] [--max-a A] [--decode]
"""
import _path  # noqa: F401  (checkout import shim; no-op when installed)

from ldpc_3gpp_tpu.cli import testbench_main

if __name__ == "__main__":
    testbench_main()
