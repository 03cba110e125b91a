"""Binned numeric range join.

Spark has no native range-join optimization for ``fact.value BETWEEN
dim.lo AND dim.hi``: the naive formulation plans a
BroadcastNestedLoopJoin — every fact row probes every range row,
O(|fact| x |ranges|) comparisons, which at 100 TB is the difference
between a map-side join and a job that never finishes.  (The as-of
join family, operators/asof.py, solves the *temporal* case; this is
the general numeric-interval case, e.g. value bands, price tiers,
histogram buckets.)

The classic fix (same trick Databricks' range-join hints implement,
and the banding used in asof.py): overlay a uniform grid of width
``bin_width`` on the number line, expand each range to the grid
cells it covers (one exploded row per cell), key facts by their
single containing cell, and equi-join on the cell id.  The residual
``lo <= v < hi`` predicate filters the at-most-two boundary cells'
false hits.  The join becomes a BroadcastHashJoin (ranges-side is
dim-sized), the fact side stays map-side only — zero shuffle of the
big table — and cost is O(|fact| + |ranges| x cells_per_range).

``bin_width`` trades dim blow-up against residual-filter selectivity;
pick it near the median range width so each range covers O(1) cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def binned_range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Join ``fact`` rows to ``ranges`` rows with
    ``lo <= value < hi`` (half-open, the non-overlapping-band
    convention) via grid binning.  Columns from both sides survive;
    the internal ``_cell`` key is dropped.

    ``how`` supports 'inner' and 'left' ('left' keeps unmatched fact
    rows with NULL range columns — implemented as inner + anti-union
    because the cell equi-join would otherwise duplicate unmatched
    facts per probed cell).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w = F.lit(float(bin_width))
    # hi is exclusive: a range [lo, hi) covers cells floor(lo/w) ..
    # floor((hi - ulp)/w); using hi directly would add one empty
    # boundary cell when hi lands exactly on a grid line — harmless
    # for correctness (residual filter kills it) but one wasted row,
    # so probe ceil(hi/w) - 1 instead, clamped to >= floor(lo/w).
    lo_cell = F.floor(F.col(lo_col) / w).cast("long")
    hi_cell = F.greatest(
        lo_cell, (F.ceil(F.col(hi_col) / w) - F.lit(1)).cast("long")
    )
    exploded = ranges.withColumn(
        "_cell", F.explode(F.sequence(lo_cell, hi_cell))
    )
    if broadcast_ranges:
        exploded = F.broadcast(exploded)
    keyed = fact.withColumn(
        "_cell", F.floor(F.col(value_col) / w).cast("long")
    )
    residual = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    matched = keyed.join(exploded, "_cell").filter(residual).drop("_cell")
    if how == "inner":
        return matched
    misses = keyed.drop("_cell").join(
        exploded.select(lo_col, hi_col),
        residual,
        "left_anti",
    )
    null_ranges = [F.lit(None).cast(f.dataType).alias(f.name)
                   for f in ranges.schema.fields]
    return matched.unionByName(misses.select("*", *null_ranges))
