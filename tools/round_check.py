"""One-shot round checklist — runs every computed gate the rotation
discipline depends on and exits non-zero if any fails:

  1. tools/staleness.py (report; with ROUND_CHECK_MAX_STALE set,
     also the exit-1 visibility gate);
  2. tools/doclint.py (numeric claims in SCALE/COVERAGE vs committed
     artifacts);
  3. tools/queue_check.py (every queued operator's artifact set);
  4. tools/sweep.py --check (committed sweep keys == registry).

Usage: python tools/round_check.py
The per-query correctness gate stays separate
(tools/check_correctness.py — scope it; some oracles are
intentionally quadratic at sf0.1) as do the bench tiers.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, args: list[str]) -> int:
    print(f"--- {label}: {' '.join(args)}")
    rc = subprocess.call([sys.executable] + args, cwd=REPO)
    print(f"--- {label}: exit {rc}\n")
    return rc


def main() -> int:
    stale_args = ["tools/staleness.py"]
    max_stale = os.environ.get("ROUND_CHECK_MAX_STALE")
    if max_stale:
        stale_args += ["--max-stale-round", max_stale]
    failures = 0
    failures += run("staleness", stale_args) != 0
    failures += run(
        "doclint", ["tools/doclint.py", "SCALE.md", "COVERAGE.md"]
    ) != 0
    failures += run("queue", ["tools/queue_check.py"]) != 0
    failures += run("sweep", ["tools/sweep.py", "--check"]) != 0
    print(f"round_check: {4 - failures}/4 gates green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
