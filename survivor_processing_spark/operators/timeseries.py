"""Time-series regularization: calendar densification (gap fill)
with forward fill — the resample/ffill shape of the reference's
episode timeline handling, distributed.

Scale shape: the dense calendar is generated PER KEY with
``sequence()`` + ``explode`` (no driver-side date loop, no cross
join against a materialized calendar table); the forward fill is
``last(ignorenulls)`` over one (key × date) window — a single
shuffle on the key, and every key's series is independent so the
window never crosses keys.  Spark evaluates the ROWS UNBOUNDED
PRECEDING frame incrementally (running state, not a per-row rescan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_daily_ffill(
    daily: DataFrame,
    keys: list[str],
    date_col: str,
    value_cols: list[str],
    span_lo,
    span_hi,
) -> DataFrame:
    """Densify ``daily`` (one row per key per PRESENT day) to one row
    per key per day in [span_lo, span_hi], forward-filling
    ``value_cols`` from each key's last present day.  Adds
    ``was_gap`` (true for synthesized rows).  Days before a key's
    first observation stay NULL (nothing to carry)."""
    skeleton = (
        daily.select(*keys)
        .distinct()
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.lit(span_lo).cast("date"),
                    F.lit(span_hi).cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias(date_col),
        )
    )
    joined = skeleton.join(daily, keys + [date_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        date_col,
        F.col(value_cols[0]).isNull().alias("was_gap"),
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled


def merge_intervals(
    df: DataFrame, keys: list[str], start_col: str, end_col: str
) -> DataFrame:
    """Merge overlapping/touching intervals per key (gaps-and-islands).

    Classic two-window plan: an interval starts a new island iff its
    start exceeds the running max end of every earlier interval in
    the key's (start, end) order; the island id is the running sum of
    those flags.  Returns one row per island: ``keys``,
    ``island_start`` = min start, ``island_end`` = max end,
    ``n_intervals``.

    Scale shape: both windows and the final aggregation share ONE
    partitioning on ``keys`` (a single shuffle end-to-end); each
    key's series is independent so no window is global, and Spark
    evaluates both running frames incrementally.  Equal (start, end)
    ties cannot split an island — a tied row's running-max-end
    already covers its start — so the output is order-deterministic
    even though the tie order itself is not.

    Contract: ``start_col``/``end_col`` must be non-null with
    start ≤ end per row (NULL starts would sort first and open a
    spurious island; an inverted interval could bridge a real gap).
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_end = F.max(end_col).over(w_prev)
    flagged = df.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    ).withColumn("_island", F.sum("_new_island").over(w_run))
    return flagged.groupBy(*keys, "_island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("_island")
