"""Quick-tier guard: docs quoting the bench dispatch protocol match bench.py.

VERDICT round-4 weak #3: DESIGN.md carried "128x1024 ... dispatch" lines
after the measured protocol moved to 128x2048.  The grep-level rule lives
in tools/regen_goldens.py::doc_consistency (regen refuses to run against
stale docs); this test runs the same check in the quick tier so the drift
is caught at commit time, not at the next artifact regen.
"""
import importlib.util
import os

HERE = os.path.dirname(__file__)


def _load_regen():
    import sys

    tools = os.path.join(HERE, "..", "tools")
    if tools not in sys.path:  # the module's checkout shim import
        sys.path.insert(0, tools)
    spec = importlib.util.spec_from_file_location(
        "regen_goldens", os.path.join(tools, "regen_goldens.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_docs_quote_current_dispatch_protocol():
    problems = _load_regen().doc_consistency()
    assert not problems, "\n".join(problems)


def test_doc_consistency_catches_drift(tmp_path):
    """The guard has teeth: a doc quoting a non-current protocol on a
    'dispatch' line is flagged; 'historical' marks are exempt."""
    regen = _load_regen()
    (tmp_path / "CLAUDE.md").write_text(
        "bench runs a 128x1024 dispatch\n")
    (tmp_path / "DESIGN.md").write_text(
        "the 128x1024 dispatch was historical; now batch=128 x steps=2048\n")
    problems = regen.doc_consistency(root=str(tmp_path))
    assert len(problems) == 2  # stale CLAUDE line + CLAUDE missing proto
    assert any("CLAUDE.md:1" in p for p in problems)
    assert any("never states" in p for p in problems)
    assert not any("DESIGN" in p for p in problems)
