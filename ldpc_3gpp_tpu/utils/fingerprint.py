"""Decoder-semantics fingerprint for measured golden artifacts.

golden/* artifacts are MEASURED on TPU and must be re-measured after any
decoder-semantics change (CLAUDE.md rule).  Stamping this hash into each
artifact lets regen tools refuse to mix stale and fresh measurements, and
lets gate tests flag goldens that predate the current sources.

The hash covers a NORMALIZED form of the semantics-relevant sources — the
AST with docstrings stripped, plus the raw bytes of the base-graph tables —
so comment/docstring/formatting edits do not invalidate measured artifacts
(an earlier raw-bytes version tripped on a comment-only commit; advisor
round-3 finding).  Anything that changes executable structure (constants,
defaults, control flow) still changes the stamp.

tests/test_goldens_stamped.py asserts every stamped golden matches the
current fingerprint, so a silent mismatch cannot survive the quick tier;
after a VERIFIED-neutral change (the on-chip statistical gates in
tests/test_tpu_kernel.py pass against the existing artifact), re-stamp with
``python tools/regen_goldens.py --restamp``.
"""
from __future__ import annotations

import ast
import glob
import hashlib
import os


def _normalized(path: str) -> bytes:
    """Comment/docstring/formatting-invariant dump of one Python source."""
    with open(path, "r") as fid:
        tree = ast.parse(fid.read())
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef),
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return ast.dump(
        tree, annotate_fields=False, include_attributes=False
    ).encode()


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
        h.update(os.path.relpath(f, root).encode())
        h.update(_normalized(f))
    # the base-graph shift tables are semantics too (binary: raw bytes)
    npz = os.path.join(root, "spec", "base_graphs.npz")
    with open(npz, "rb") as fid:
        h.update(fid.read())
    return h.hexdigest()[:16]
