"""Watermarked stream-stream interval join — the Structured
Streaming operator the N-family was still missing: correlate two
live event streams (views↔clicks, requests↔responses, crawl
fetch↔parse) where a static join can't run because neither side is
ever complete.

Spark semantics used (public: Structured Streaming programming
guide, stream-stream joins): BOTH sides carry a watermark and the
join condition carries a TIME BOUND, so the state store provably
evicts — a row of either side is held only until the watermark
passes the interval's far edge.  Without the bound the state grows
forever; this wrapper refuses to build such a join.

Scale shape: the join keys hash-partition both streams identically
(one shuffle each), the interval predicate evaluates inside the
joined partition, and state size is bounded by
rate × (watermark + interval width) per key — the 100 TB/day streams
case is exactly what this operator exists for.  With
``availableNow`` over a file source the same code replays a backlog
batch-by-batch and then matches the static interval join row-for-row
(the cross-engine gate in tests/test_stream_join.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    lower: str = "0 seconds",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join of two (streaming or static) frames on ``keys`` with
    ``right_ts`` in ``[left_ts + lower, left_ts + upper]``.

    Both sides are watermarked on their own timestamp before the
    join (required for state eviction on streams; harmless no-op on
    static frames, so the SAME function is the batch oracle path).
    ``left_ts`` and ``right_ts`` must be distinct names — the output
    keeps both, plus left's columns and right's non-key columns.
    ``lower``/``upper``/``watermark`` are SQL interval strings.

    ``how``: ``inner`` or ``left_outer``.  The outer form emits an
    unmatched left row with NULL right columns once the watermark
    passes its interval's far edge — Spark can only declare "no
    match will ever come" after that point, which is exactly why
    outer stream-stream joins REQUIRE the watermark + time bound
    this wrapper always builds."""
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names"
        )
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(overlap)}"
        )
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    for k in keys:
        rw = rw.withColumnRenamed(k, f"__r_{k}")
    cond = " AND ".join(
        [f"{k} = __r_{k}" for k in keys]
        + [
            f"{right_ts} >= {left_ts} + interval {lower}",
            f"{right_ts} <= {left_ts} + interval {upper}",
        ]
    )
    return lw.join(rw, F.expr(cond), how).drop(
        *[f"__r_{k}" for k in keys]
    )


def stream_interval_join_oracle(
    keys: list[str],
    left_sql: str,
    right_sql: str,
    left_ts: str,
    right_ts: str,
    upper_s: int,
    lower_s: int = 0,
    how: str = "inner",
) -> str:
    """DuckDB SQL for the batch-equivalent interval join — with an
    ``availableNow`` replay and a watermark exceeding the fixture's
    time span, the streaming result must match this row-for-row.
    ``upper_s``/``lower_s`` are the interval bounds in seconds."""
    on = " AND ".join(f"l.{k} = r.{k}" for k in keys)
    key_cols = ", ".join(f"l.{k} AS {k}" for k in keys)
    jtype = "JOIN" if how == "inner" else "LEFT JOIN"
    return f"""SELECT {key_cols}, l.* EXCLUDE ({", ".join(keys)}),
       r.* EXCLUDE ({", ".join(keys)})
FROM ({left_sql}) l {jtype} ({right_sql}) r
  ON {on}
 AND r.{right_ts} >= l.{left_ts} + INTERVAL {lower_s} SECOND
 AND r.{right_ts} <= l.{left_ts} + INTERVAL {upper_s} SECOND"""
