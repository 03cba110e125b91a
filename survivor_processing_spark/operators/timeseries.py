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
    ``was_gap`` (true for synthesized rows — derived from a presence
    marker tagged on the daily side BEFORE the join, so a genuinely
    present day whose value columns happen to be NULL is still
    ``was_gap = false``).  Days before a key's first observation stay
    NULL (nothing to carry)."""
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
    joined = skeleton.join(
        daily.withColumn("_present", F.lit(True)), keys + [date_col], "left"
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        date_col,
        F.col("_present").isNull().alias("was_gap"),
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


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    t_col: str,
    yq_col: str,
) -> DataFrame:
    """Linear interpolation of NULL gaps in an integer-lane series —
    the resample companion to :func:`resample_daily_ffill` for
    measurements where carrying the last value forward is a lie
    (sensor readings, prices, rates).

    Exactness contract: ``t_col`` (BIGINT, unique per key) and
    ``yq_col`` (BIGINT lanes — quantize floats upstream with one
    deterministic cast) are integers, so the interpolated value at t
    between known points (t0,y0) and (t1,y1) is the EXACT rational

        num = y0·(t1−t0) + (y1−y0)·(t−t0),   den = t1−t0

    emitted as two BIGINT lanes (downstream divides, rounds, or
    merges exactly — the q:ols_trend_exact convention).  Known rows
    pass through as num=y, den=1; leading/trailing NULLs (no
    bracketing neighbor) stay NULL on both lanes.

    Scale shape: two incremental windows (last-non-null back,
    last-non-null forward-as-reverse) on ONE partitioning by key — a
    single shuffle; each key's series is independent.  BOTH windows
    are RUNNING frames (UNBOUNDED PRECEDING → CURRENT ROW): the
    forward neighbor is last-non-null over the DESCENDING-t order,
    because Spark's WindowExec computes a running frame in O(n) per
    partition but a (CURRENT ROW → UNBOUNDED FOLLOWING) frame by
    rescanning to the partition end for every row — O(n²), measured
    6.3 s at sf0.1 vs 0.9 s for this formulation, and quadratic
    ruin at 100 TB partition sizes.  The second sort (same keys,
    reversed t) reuses the one Exchange.  Overflow headroom:
    |y|·gap must stay under 2⁶³ — at 10⁹ lanes and day-second gaps
    (~10⁵) that is 10¹⁴, four decades of margin.

    Returns ``keys, t_col, yq_col, y_num, y_den, was_interpolated``.
    """
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(t_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col(yq_col)
    t_known = F.when(y.isNotNull(), F.col(t_col))
    with_nb = df.select(
        *keys,
        t_col,
        yq_col,
        F.last(y, ignorenulls=True).over(w_back).alias("_y0"),
        F.last(t_known, ignorenulls=True).over(w_back).alias("_t0"),
        F.last(y, ignorenulls=True).over(w_fwd).alias("_y1"),
        F.last(t_known, ignorenulls=True).over(w_fwd).alias("_t1"),
    )
    gap = F.col("_t1") - F.col("_t0")
    num = F.col("_y0") * gap + (F.col("_y1") - F.col("_y0")) * (
        F.col(t_col) - F.col("_t0")
    )
    interp_ok = y.isNull() & F.col("_y0").isNotNull() & F.col("_y1").isNotNull()
    return with_nb.select(
        *keys,
        t_col,
        yq_col,
        F.when(y.isNotNull(), y)
        .when(interp_ok, num)
        .alias("y_num"),
        F.when(y.isNotNull(), F.lit(1).cast("long"))
        .when(interp_ok, gap.cast("long"))
        .alias("y_den"),
        interp_ok.alias("was_interpolated"),
    )


def interpolate_linear_oracle(
    keys: list[str],
    t_col: str,
    yq_col: str,
    source_sql: str,
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`interpolate_linear` over ``source_sql`` (a subquery
    producing the same ``keys + [t_col, yq_col]`` columns)."""
    part = ", ".join(keys)
    ks = ", ".join(keys)
    return f"""WITH src AS ({source_sql}), nb AS (
    SELECT {ks}, {t_col}, {yq_col},
           last_value({yq_col} IGNORE NULLS) OVER (
               PARTITION BY {part} ORDER BY {t_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
           last_value(CASE WHEN {yq_col} IS NOT NULL THEN {t_col} END
                      IGNORE NULLS) OVER (
               PARTITION BY {part} ORDER BY {t_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
           first_value({yq_col} IGNORE NULLS) OVER (
               PARTITION BY {part} ORDER BY {t_col}
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1,
           first_value(CASE WHEN {yq_col} IS NOT NULL THEN {t_col} END
                       IGNORE NULLS) OVER (
               PARTITION BY {part} ORDER BY {t_col}
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
    FROM src
)
SELECT {ks}, {t_col}, {yq_col},
       CAST(CASE WHEN {yq_col} IS NOT NULL THEN {yq_col}
                 WHEN y0 IS NOT NULL AND y1 IS NOT NULL
                 THEN y0 * (t1 - t0) + (y1 - y0) * ({t_col} - t0)
            END AS BIGINT) AS y_num,
       CAST(CASE WHEN {yq_col} IS NOT NULL THEN 1
                 WHEN y0 IS NOT NULL AND y1 IS NOT NULL THEN t1 - t0
            END AS BIGINT) AS y_den,
       ({yq_col} IS NULL AND y0 IS NOT NULL AND y1 IS NOT NULL)
           AS was_interpolated
FROM nb"""
