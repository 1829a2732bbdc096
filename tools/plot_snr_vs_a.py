#!/usr/bin/env python3
"""CLI mirror of the reference's plot_SNR_vs_A.m (checkout wrapper).

Canonical implementation: ldpc_3gpp_tpu/cli.py::snr_vs_a_main — installed
as the ``ldpc-snr-vs-a`` console command (pyproject).  Run with no arguments
for the reference's default experiment (plot_SNR_vs_A.m:37-49): A=1000..8000,
BG1, R=1/3, QPSK, 50 iterations, required Es/N0 at BLER 1e-2.  Writes
results/*.txt (A<TAB>EsN0) and a PNG.
"""
import _path  # noqa: F401  (checkout import shim; no-op when installed)

from ldpc_3gpp_tpu.cli import snr_vs_a_main

if __name__ == "__main__":
    snr_vs_a_main()
