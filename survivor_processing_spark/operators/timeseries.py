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
