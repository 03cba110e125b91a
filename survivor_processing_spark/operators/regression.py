"""Grouped least-squares trend in EXACT RATIONAL arithmetic — the
portable member of the ``regr_*`` aggregate family (ANSI SQL 2003;
Spark and DuckDB both ship float ``regr_slope``/``regr_intercept``,
whose doubles can disagree at the ulp level across engines and
summation orders — a value-hash poison).

Pipeline use: per-cohort metric drift ("is this source's quality
score trending down across crawl snapshots?", "token yield per
domain over time") — the monitoring aggregate a curation dashboard
computes next to the heavy hitters and sketches.  The reference has
no regression surface; beyond-reference mandate.

Portable recipe (the integer-lane playbook the engine's other
portable gates use — SCALE.md "portable-variant scale notes"):
quantize both
columns once (``floor(v*scale+0.5)`` → int64), then every moment
(n, Σx, Σy, Σxy, Σx²) is an exact order-free integer and the
closed-form OLS solution is an exact RATIONAL:

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy·slope_den − slope_num·Σx) / (n·slope_den)
    R²        = slope_num² / (slope_den · syy_c)

The slope ships as a bigint (num, den) pair — bit-identical in any
engine; intercept and R² are computed DOWNSTREAM from the emitted
raw/centered moments with ``fractions.Fraction`` (still exact),
never in-engine: each extra int64 product multiplies the overflow
envelope, and both the intercept product (n³ growth) and the R²
square (doubled exponent) blew int64 on group sizes whose linear
moments were fine — ANSI mode catches it loudly, but the right fix
is emitting moments, not products.  A degenerate group (one point,
or all x equal) yields slope 0/0 — deterministic, not
NULL-poisoned.

Overflow envelope for what IS computed in-engine (document, don't
guess): |slope_num| ≤ 2·n²·(scale·X)·(scale·Y) for value bounds
X, Y.  The default scale 1000 holds |x|,|y| ≤ 1e3 exactly on the
grid and keeps n ≤ ~5e4 rows/group inside int64; for bigger groups
lower ``scale`` or pre-aggregate x-duplicates.  At 100 TB the plan
is one map-side-combined hash aggregate — moments are Spark's own
partial-agg shape, no window, no sort — and the emitted moments are
MERGEABLE state (operators/partial_agg.py philosophy): shard fits
re-combine by adding moments.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _q(col: str, scale: int):
    return F.expr(
        f"cast(floor(cast({col} as double) * {scale} + 0.5) as bigint)"
    )


def ols_trend_exact(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Per-group OLS fit of ``y ~ x`` on the 1/scale fixed-point
    grid: returns group cols + ``n_points, sx, sy, slope_num,
    slope_den, syy_c`` (all bigint, exact).

    The slope ships as a rational (``slope_num = n·Σxy−ΣxΣy``,
    ``slope_den = n·Σx²−(Σx)²``); everything NEEDING a higher-degree
    product ships as raw moments instead, computed downstream in
    arbitrary precision (``Fraction``), because each extra in-engine
    multiplication multiplies the int64 envelope:

    - intercept = (sy·slope_den − slope_num·sx) / (n·slope_den) —
      the product form overflowed at sf0.1 group sizes (n³ growth)
      while the moments themselves were nowhere near the limit;
    - R² = slope_num² / (slope_den·syy_c) with ``syy_c`` =
      n·Σy²−(Σy)² — same story, squaring doubles the exponent.

    Rows with a NULL in either column are dropped (mirrored by the
    oracle).  Degenerate groups stay deterministic: constant x →
    slope 0/0; constant y → ``syy_c`` 0 (R² 0/0)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    qx, qy = _q(x_col, scale), _q(y_col, scale)
    clean = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    moments = clean.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(qx).alias("_sx"),
        F.sum(qy).alias("_sy"),
        F.sum(qx * qy).alias("_sxy"),
        F.sum(qx * qx).alias("_sxx"),
        F.sum(qy * qy).alias("_syy"),
    )
    slope_num = (
        F.col("n_points") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    )
    slope_den = (
        F.col("n_points") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    syy_c = (
        F.col("n_points") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    )
    return moments.select(
        *group_cols,
        "n_points",
        F.col("_sx").cast("bigint").alias("sx"),
        F.col("_sy").cast("bigint").alias("sy"),
        slope_num.cast("bigint").alias("slope_num"),
        slope_den.cast("bigint").alias("slope_den"),
        syy_c.cast("bigint").alias("syy_c"),
    )


def ols_trend_oracle(
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 1000,
    table: str = "events",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`ols_trend_exact` from the same parameters."""
    g = ", ".join(group_cols)
    return f"""
WITH q AS (
    SELECT {g},
           CAST(floor(CAST({x_col} AS DOUBLE) * {scale} + 0.5)
                AS BIGINT) AS qx,
           CAST(floor(CAST({y_col} AS DOUBLE) * {scale} + 0.5)
                AS BIGINT) AS qy
    FROM {table}
    WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
), m AS (
    SELECT {g},
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(qx) AS BIGINT) AS sx,
           CAST(SUM(qy) AS BIGINT) AS sy,
           CAST(SUM(qx * qy) AS BIGINT) AS sxy,
           CAST(SUM(qx * qx) AS BIGINT) AS sxx,
           CAST(SUM(qy * qy) AS BIGINT) AS syy
    FROM q GROUP BY {g}
)
SELECT {g}, n_points, sx, sy,
       CAST(n_points * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_points * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(n_points * syy - sy * sy AS BIGINT) AS syy_c
FROM m
"""
