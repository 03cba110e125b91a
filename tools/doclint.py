"""Rollup-prose number lint (VERDICT r06 "What's wrong" #1 / "Next
round" #3): twice now (r5, r6) the SCALE.md round rollup quoted
numbers that contradicted the committed JSON artifacts in the same
repo.  This tool makes the check mechanical: every numeric claim on
a prose line that NAMES an artifact file must appear in that
artifact (at the quoted rounding), or the lint fails.

Rules (deliberately simple — lintable beats clever):
- Scope: lines in the given markdown file(s) from the section whose
  heading matches ``--since`` (default: lint the whole file) that
  mention one or more ``*.json`` artifact names living at the repo
  root.
- Every number on such a line (integers with >=3 digits or decimals;
  short counts like "3 queries" are too ambiguous to pin) must match
  some value in at least one named artifact: a leaf number (rounded
  to the quoted precision), a container length, or the sum of any
  dict-of-numbers (e.g. a queries map's total), or a number appearing
  inside a string leaf.
- A line may opt out with the marker ``doclint:off`` (for prose that
  references an artifact while quoting numbers from somewhere else —
  use sparingly and say where the number is from).

Usage: python tools/doclint.py [SCALE.md ...] [--since HEADING_REGEX]
Exit 1 on any unmatched claim, listing file:line, number, artifact.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_NUM = re.compile(r"(?<![\w.])(\d+\.\d+|\d{3,})(?![\w.])")
_ART = re.compile(r"\b([A-Za-z0-9_.-]+\.json)\b")


def _values(doc) -> set[float]:
    """Recursive value set: leaves, container lengths, dict sums,
    numbers embedded in string leaves."""
    out: set[float] = set()

    def walk(x) -> None:
        if isinstance(x, bool):
            return
        if isinstance(x, (int, float)):
            out.add(float(x))
        elif isinstance(x, str):
            for m in _NUM.finditer(x):
                out.add(float(m.group(1)))
        elif isinstance(x, list):
            out.add(float(len(x)))
            for v in x:
                walk(v)
        elif isinstance(x, dict):
            out.add(float(len(x)))
            nums = [
                v
                for v in x.values()
                if isinstance(v, (int, float)) and not isinstance(v, bool)
            ]
            if nums:
                out.add(float(sum(nums)))
            for v in x.values():
                walk(v)

    walk(doc)
    return out


def _matches(claim: str, values: set[float]) -> bool:
    c = float(claim)
    dec = len(claim.split(".")[1]) if "." in claim else 0
    for v in values:
        if v == c:
            return True
        # the prose may quote a rounded form of a more precise value
        if dec and round(v, dec) == c:
            return True
        if not dec and abs(v - c) < 0.5:  # "465 s" for 465.1
            return True
    return False


def lint_file(path: str, since: str | None) -> list[str]:
    errs: list[str] = []
    cache: dict[str, set[float] | None] = {}
    # --since scoping: a heading matching the regex opens the scope;
    # it stays open through deeper-level subheadings and closes at
    # the next same-or-higher-level heading that does not match
    active = since is None
    active_level = 99
    # markdown wraps prose, so claims are checked per PARAGRAPH
    # (blank-line- or heading-delimited): all artifact names in the
    # paragraph pool their value sets, and every number in it must
    # match the pool
    paras: list[tuple[int, str]] = []
    cur: list[str] = []
    cur_start = 1
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            if since is not None and line.startswith("#"):
                level = len(line) - len(line.lstrip("#"))
                if re.search(since, line):
                    active, active_level = True, level
                elif level <= active_level:
                    active = False
            boundary = line.startswith("#") or not line.strip()
            # a new list item starts its own claim scope — pooling a
            # whole rollup list would let one item's artifact vouch
            # for another item's numbers (and one doclint:off silence
            # them all)
            new_item = re.match(r"\s*(?:[-*]|\d+\.)\s", line) is not None
            if boundary or new_item:
                if cur:
                    paras.append((cur_start, " ".join(cur)))
                    cur = []
                if boundary:
                    continue
            if active:
                if not cur:
                    cur_start = ln
                cur.append(line.strip())
        if cur:
            paras.append((cur_start, " ".join(cur)))

    for start, text in paras:
        if "doclint:off" in text:
            continue
        arts = [
            a for a in _ART.findall(text) if os.path.exists(os.path.join(REPO, a))
        ]
        if not arts:
            continue
        vals: set[float] = set()
        for a in arts:
            if a not in cache:
                try:
                    with open(os.path.join(REPO, a)) as af:
                        cache[a] = _values(json.load(af))
                except (OSError, json.JSONDecodeError):
                    cache[a] = None
            if cache[a]:
                vals |= cache[a]
        if not vals:
            continue
        for m in _NUM.finditer(text):
            claim = m.group(1)
            if not _matches(claim, vals):
                errs.append(
                    f"{path}:{start}: {claim!r} not found in "
                    f"{'/'.join(arts)} (para: {text.strip()[:100]})"
                )
    return errs


# package-relative python-module cites (the COVERAGE.md q:-table's
# middle column and rollup prose): every `queries/foo.py`-shaped
# token must resolve against the tree, so a module rename (r9's
# queries/llm.py split went stale for two rounds — VERDICT r10
# "What's wrong" #3) fails CI instead of rotting
_PKG = "survivor_processing_spark"
_MOD = re.compile(
    r"\b((?:queries|operators|sources|sinks|functions|streaming|"
    r"pipelines)/[A-Za-z0-9_]+\.py)\b"
)


def lint_module_cites(path: str) -> list[str]:
    """Check every package-relative ``dir/mod.py`` cite in ``path``
    resolves to a file under ``survivor_processing_spark/`` (or the
    repo root, for tools/tests prose).  ``doclint:off`` on the line
    opts out, same as the numeric lint."""
    errs: list[str] = []
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            if "doclint:off" in line:
                continue
            for m in _MOD.finditer(line):
                rel = m.group(1)
                if os.path.exists(
                    os.path.join(REPO, _PKG, rel)
                ) or os.path.exists(os.path.join(REPO, rel)):
                    continue
                errs.append(
                    f"{path}:{ln}: cited module {rel!r} does not "
                    f"exist under {_PKG}/ (renamed?)"
                )
    return errs


def main() -> int:
    argv = sys.argv[1:]
    since = None
    lint_all = "--all" in argv
    if "--since" in argv:
        i = argv.index("--since")
        since = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    files = args or [os.path.join(REPO, "SCALE.md")]
    if since is None and not lint_all:
        # default: the LATEST "Round N" section — historical sections
        # legitimately quote artifact versions that later rounds
        # overwrote (BENCH_STRETCH.json etc. are single files), so
        # only the current round's prose is held to the current JSON
        latest = 0
        for p in files:
            with open(p) as f:
                for line in f:
                    m = re.match(r"#+.*\bRound[ -](\d+)", line, re.I)
                    if m:
                        latest = max(latest, int(m.group(1)))
        if latest:
            since = rf"Round[ -]{latest}\b"
            print(f"doclint: defaulting to --since '{since}' (use --all "
                  "to lint every section)")
    errs: list[str] = []
    for p in files:
        errs += lint_file(p, since)
        # module-cite lint runs over the WHOLE file regardless of
        # --since: a stale cite in an old section still misleads
        errs += lint_module_cites(p)
    for e in errs:
        print(e)
    print(f"doclint: {len(errs)} unmatched numeric claim(s)")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
