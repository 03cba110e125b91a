"""Slowly-changing-dimension (type 2) builder.

The reference maintains keyed dimension tables via ON CONFLICT
upserts (reference: helpers/load_helpers.py:4-39) — type-1 overwrite
semantics.  A warehouse at scale usually also needs the type-2 form:
keep every historical attribute value with an effective-date range
instead of overwriting.  This module derives SCD2 ranges from a
change history in one pass of window functions:

1. collapse consecutive rows with unchanged attributes (lag compare —
   classic run-length compression, so a key that never changes yields
   one row no matter how many snapshots were taken);
2. ``effective_from`` = change timestamp, ``effective_to`` = next
   change minus one day (closed-interval convention),
   ``is_current`` on the open row.

Scale shape: two window passes over the SAME (key, ts) partitioning
— Catalyst plans ONE shuffle and reuses the sort for both windows.
No self-join, no driver state; a billion-key dimension distributes
by key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_from_history(
    history: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    open_end: str = "9999-12-31",
) -> DataFrame:
    """(key, ts, attrs) snapshots -> SCD2 rows with
    ``effective_from`` / ``effective_to`` (date strings, closed
    interval) and ``is_current``.  Input must be unique per
    (key, ts) — aggregate upstream if not.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    # first row per key is always a change (lag(ts) null), even when
    # every attr is null — don't rely on eqNullSafe for it
    changed = F.lag(ts_col).over(w).isNull()
    for a in attrs:
        prev = F.lag(a).over(w)
        # null-safe "is distinct from": null -> value counts as a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    compressed = history.withColumn("_chg", changed).filter("_chg").drop("_chg")
    w2 = Window.partitionBy(*keys).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w2)
    return compressed.select(
        *keys,
        *attrs,
        F.date_format(ts_col, "yyyy-MM-dd").alias("effective_from"),
        F.coalesce(
            F.date_format(F.date_sub(nxt, 1), "yyyy-MM-dd"), F.lit(open_end)
        ).alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )
