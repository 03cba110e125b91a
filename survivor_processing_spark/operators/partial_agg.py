"""Mergeable aggregation state — incremental materialized-aggregate
maintenance.

The reference recomputes its per-episode stats tables from scratch
every load (reference: episode_stats pipelines; SURVEY §2.E).  The
incremental form keeps the AGGREGATE STATE (count / sum / min / max
are all commutative monoids) and folds each new batch's partial
state into it — the same algebra Spark itself uses for map-side
partial aggregation, lifted to cross-run persistence.

Scale shape: re-aggregating 100 TB to refresh yesterday's totals is
the anti-pattern; merging a day's partial state into a keyed state
table is a shuffle of the DELTA only.  The merge here is
union + one hash aggregate — at warehouse scale the state side
would be a bucketed table so only the delta shuffles (see
sinks/merge.py for the keyed-upsert landing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def partial_agg_state(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    max_cols: dict[str, str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Aggregate a raw batch into mergeable state: COUNT(*), SUMs,
    and MAXes keyed by ``keys``.  ``sum_cols``/``max_cols`` map
    output-name -> source expression (cast sums to decimal upstream
    for order-free exactness)."""
    aggs = [F.count("*").alias(count_col)]
    aggs += [F.sum(src).alias(out) for out, src in sum_cols.items()]
    for out, src in (max_cols or {}).items():
        aggs.append(F.max(src).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame],
    keys: list[str],
    sum_cols: list[str],
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Fold partial states into one: counts and sums add, maxes max.
    All inputs must share the state schema (the output of
    ``partial_agg_state``)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.max(c).alias(c) for c in (max_cols or [])]
    return merged.groupBy(*keys).agg(*aggs)
