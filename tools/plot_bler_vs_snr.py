#!/usr/bin/env python3
"""CLI mirror of the reference's plot_BLER_vs_SNR.m (checkout wrapper).

Canonical implementation: ldpc_3gpp_tpu/cli.py::bler_sweep_main — installed
as the ``ldpc-bler-sweep`` console command (pyproject).  Run with no
arguments for the reference's default experiment (plot_BLER_vs_SNR.m:30-42):
BG2, A=3842, R=1/3, QPSK, 8 iterations.  Writes results/*.txt
(EsN0<TAB>BLER per line) and a PNG plot.
"""
import _path  # noqa: F401  (checkout import shim; no-op when installed)

from ldpc_3gpp_tpu.cli import bler_sweep_main

if __name__ == "__main__":
    bler_sweep_main()
