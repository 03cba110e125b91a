"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() forces the full plan —
results stay on executors; nothing but the count crosses to the
driver).  A warm-up pass on sf0.001 first touches every code path so
JVM/codegen warm-up isn't billed to the measured run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from survivor_processing_spark import get_spark  # noqa: E402
from survivor_processing_spark.queries import REGISTRY  # noqa: E402

HEADLINE = [
    "flagship_contestant_stats",
    "grouped_sum_all_measures",
    "multiway_left_join",
    "window_rank_placement",
    "unpivot_measures",
    "asof_join_keyed",
    "asof_join_broadcast_dim",
    "containment_join_nullout",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "exact_dedup_docs",
    "embedding_near_dup_pairs",
    "cosine_topk",
    "text_quality_scores",
    "session_window_agg",
    "rollup_multilevel_agg",
    # round 3
    "cumulative_window_sums",
    "pivot_event_type_wide",
    "grouping_sets_agg",
    "range_join_binned",
    "scd2_order_history",
    "domain_rebalance_sample",
    "asof_join_nearest_broadcast",
    "vocab_top_terms",
    # round 3b
    "cdc_apply_changelog",
    "funnel_stage_counts",
    "fuzzy_name_match",
    "zorder_morton_keys",
    "incremental_agg_merge",
    # round 4
    "bloom_prefilter_join",
    "interval_merge_islands",
    "doc_chunk_overlap",
    "fuzzy_name_match_dist2",
    "multimodal_header_parse",
]


def _execute(df) -> None:
    """Force FULL computation of every output column, driver-free.

    ``count()`` would let Catalyst prune unreferenced projections —
    a projection-only query would be billed as a bare scan.  The
    ``noop`` sink consumes every row/column on the executors and
    writes nothing."""
    df.write.format("noop").mode("overwrite").save()


def run_one(spark, name: str, sf_dir: str, reps: int = 3) -> float:
    """Best-of-N wall time: each rep re-builds the DataFrame (so
    planning is billed) and executes to completion; min over reps
    removes scheduler/GC noise without hiding real cost."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _execute(REGISTRY[name].fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    for name in HEADLINE:  # warm-up: JVM, codegen, file listing
        _execute(REGISTRY[name].fn(spark, "/root/testdata/sf0.001"))

    queries: dict[str, float] = {}
    for name in HEADLINE:
        queries[name] = round(run_one(spark, name, sf_dir), 3)
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
