"""Decoder-semantics fingerprint for measured golden artifacts.

golden/* artifacts are MEASURED on TPU and must be re-measured after any
decoder-semantics change (CLAUDE.md rule).  Stamping this hash into each
artifact lets regen tools refuse to mix stale and fresh measurements, and
lets gate tests flag goldens that predate the current sources.
"""
from __future__ import annotations

import glob
import hashlib
import os


def semantics_fingerprint() -> str:
    """SHA-256 (16 hex chars) over the decoder-semantics-relevant sources."""
    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(
        glob.glob(os.path.join(root, "ops", "*.py"))
        + glob.glob(os.path.join(root, "models", "*.py"))
        + glob.glob(os.path.join(root, "spec", "*.py"))
    )
    h = hashlib.sha256()
    for f in files:
        with open(f, "rb") as fid:
            h.update(fid.read())
    return h.hexdigest()[:16]
