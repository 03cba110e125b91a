"""As-of (nearest-preceding) and containment joins.

The reference enriches an event stream with the most recent season /
episode air time via ``pd.merge_asof`` (reference:
reddit_transform.py:12-25 ``process_nearest_event``) and NULLs the
match outside the season window (reddit_transform.py:28-34
``process_within_season``).  Spark has no DataFrame as-of join, so the
engine provides two physical strategies:

* ``strategy='broadcast'`` (default; right side is a dimension):
  rewrite the right side into half-open intervals
  ``[ts, next_ts)`` with a lead() window, then a broadcast range
  join — each left row matches at most one interval.  NO shuffle of
  the left (fact) side: at 100 TB this is a map-side operation.
* ``strategy='union'`` (both sides large, keyed): tag and union both
  sides, then ``last(right_col, ignorenulls=True)`` over a window
  ordered by (ts, tag) partitioned by the join keys — one shuffle on
  the keys, no cartesian anywhere.  Right rows sort before left rows
  at equal timestamps, so exact ties match (merge_asof
  ``allow_exact_matches=True`` semantics).

Both strategies return every left row exactly once (left-outer
semantics; unmatched → NULL right columns), matching
``pd.merge_asof(direction='backward')`` and DuckDB ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str] | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row
    with the greatest ``right_on`` <= ``left_on`` (within ``by`` keys
    if given).  Right columns keep their names; ``right_on`` is kept
    so callers can compute staleness."""
    by = by or []
    if strategy == "broadcast":
        return _asof_broadcast(left, right, left_on, right_on, by)
    if strategy == "union":
        return _asof_union(left, right, left_on, right_on, by)
    raise ValueError(f"unknown strategy {strategy!r}")


def _asof_broadcast(left, right, left_on, right_on, by):
    # interval-ize the right side: [ts, next_ts) per `by` group
    w = Window.partitionBy(*by).orderBy(right_on) if by else Window.orderBy(right_on)
    intervals = right.withColumn("_next_ts", F.lead(right_on).over(w))
    cond = (F.col(left_on) >= F.col(right_on)) & (
        F.col("_next_ts").isNull() | (F.col(left_on) < F.col("_next_ts"))
    )
    for k in by:
        cond = cond & (left[k] == intervals[k])
    joined = left.join(F.broadcast(intervals), cond, "left")
    drop = ["_next_ts"] + [intervals[k] for k in by]
    return joined.drop(*drop)


def _asof_union(left, right, left_on, right_on, by):
    right_cols = [c for c in right.columns if c not in by]
    left_cols = left.columns
    # tag=0 sorts right rows before left rows at equal ts → exact ties match
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_on).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
        *[F.col(c) for c in by],
        F.col(right_on).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by).orderBy("_ts", "_tag")
        if by
        else Window.orderBy("_ts", "_tag")
    ).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("_tag"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("_tag") == 1).drop("_tag")


def containment_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    point: str,
    start: str,
    end: str,
    null_out_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join on ``keys`` then NULL the right-side payload where
    ``point`` falls outside ``[start, end]`` — the reference's
    'within season' semantics (reddit_transform.py:28-34): the join
    row is kept, only the payload is blanked (K4 masked update)."""
    joined = left.join(right, keys, "left")
    outside = (F.col(point) < F.col(start)) | (F.col(point) > F.col(end))
    out = joined
    for c in null_out_cols or []:
        out = out.withColumn(c, F.when(outside, F.lit(None)).otherwise(F.col(c)))
    return out
