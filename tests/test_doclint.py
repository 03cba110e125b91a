"""Doc-lint gates (tools/doclint.py) — the module-cite resolver added
for VERDICT r10 "Next round" #7: COVERAGE.md's q:-table cites module
paths (``queries/foo.py``), and r9's query-bank split left two of
them stale for two rounds because the numeric lint had no notion of
a path.  These tests pin that a deliberately broken cite FAILS and a
real one passes, so a future module rename trips CI instead of
rotting in the docs.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _doclint():
    spec = importlib.util.spec_from_file_location(
        "doclint", os.path.join(REPO, "tools", "doclint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_module_cite_lint_catches_renamed_module(tmp_path):
    dl = _doclint()
    bad = tmp_path / "bad.md"
    bad.write_text(
        "| quality scoring | queries/llm.py | q:quality_model_score |\n"
    )
    errs = dl.lint_module_cites(str(bad))
    assert len(errs) == 1
    assert "queries/llm.py" in errs[0]
    assert "renamed?" in errs[0]


def test_module_cite_lint_passes_real_and_optout(tmp_path):
    dl = _doclint()
    good = tmp_path / "good.md"
    good.write_text(
        "| quality scoring | queries/llm_curation.py | q:quality_model_score |\n"
        "| dv dml | operators/mor.py | q:snapshot_mor |\n"
        "historical queries/llm.py mention doclint:off\n"
    )
    assert dl.lint_module_cites(str(good)) == []


def test_module_cite_lint_clean_on_committed_docs():
    dl = _doclint()
    for doc in ("COVERAGE.md", "SCALE.md"):
        assert dl.lint_module_cites(os.path.join(REPO, doc)) == [], doc
