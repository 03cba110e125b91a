"""Per-query driver-verification staleness histogram.

The driver records CORRECTNESS rows for the first 50 ``queries()``
entries per round, so with a >50-query registry each query's "latest
verified round" drifts.  Round-5's rollup asserted the staleness
state by hand and got it wrong by one query (VERDICT r05 "What's
wrong" #1) — this script COMPUTES it from the CORRECTNESS_r*.json
artifacts so rotation claims can't drift from reality.

Prints: a latest-round histogram, the stale tail (oldest first), and
any registered query with NO driver row yet.  Exit 0 always (it's a
reporting tool); the rotation window in __spark_entry__.py is built
from its output.

Usage: python tools/staleness.py [--max-stale-round N]
  With --max-stale-round N, exits 1 if any query's latest driver row
  OF ANY KIND is older than round N (rotation visibility, which is
  what the window controls).  Hash-health is reported separately:
  every in-window-but-never-green query is listed unconditionally,
  so a red row can't hide behind a fresh round number.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def latest_rounds(repo_root: str) -> tuple[dict[str, int], dict[str, int]]:
    """(latest round with ANY row, latest round with a hash-green row)
    per query name, across every CORRECTNESS_r*.json."""
    seen: dict[str, int] = {}
    green: dict[str, int] = {}
    for fn in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(fn) as f:
            doc = json.load(f)
        for name, row in doc.items():
            if not isinstance(row, dict):
                continue
            seen[name] = max(seen.get(name, 0), rnd)
            if row.get("hash_match"):
                green[name] = max(green.get(name, 0), rnd)
    return seen, green


def main() -> int:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    max_stale = None
    if "--max-stale-round" in sys.argv:
        max_stale = int(sys.argv[sys.argv.index("--max-stale-round") + 1])
    seen, green = latest_rounds(repo_root)
    registry = list(entrymod.queries())
    hist = Counter(seen.get(q, 0) for q in registry)
    print(f"registry: {len(registry)} queries; driver rows for {len(seen)}")
    print("latest-row histogram (round -> n_queries; 0 = never checked):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    oldest = sorted(registry, key=lambda q: (seen.get(q, 0), q))
    floor = min(hist) if hist else 0
    stale = [q for q in oldest if seen.get(q, 0) == floor]
    print(f"\noldest cohort (r{floor:02d}-latest, {len(stale)}):")
    for q in stale:
        g = green.get(q)
        print(f"  {q}  (latest green: {'r%02d' % g if g else 'never'})")
    never_green = [q for q in registry if q in seen and q not in green]
    if never_green:
        print(f"\nin-window but never hash-green ({len(never_green)}):")
        for q in never_green:
            print(f"  {q}  (latest row r{seen[q]:02d})")
    if max_stale is not None:
        bad = [q for q in registry if seen.get(q, 0) < max_stale]
        if bad:
            print(
                f"\nSTALE: {len(bad)} queries older than r{max_stale:02d}: "
                + ", ".join(bad[:20])
            )
            return 1
        print(f"\nOK: no query older than r{max_stale:02d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
