"""Checkout import shim for tools/ scripts.

``pip install -e .`` makes ldpc_3gpp_tpu importable from anywhere and the
blessed CLIs are console entry points (pyproject [project.scripts]); this
shim only exists so ``python tools/<script>.py`` keeps working from a plain
un-installed checkout, where sys.path[0] is tools/ rather than the repo
root.  It is a no-op when the package is already importable.
"""
import importlib.util
import os
import sys

if importlib.util.find_spec("ldpc_3gpp_tpu") is None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
