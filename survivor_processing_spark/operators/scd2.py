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

    The output grain is the DAY, so multiple changes on one calendar
    day first collapse to the day's last snapshot (otherwise the
    closed-interval arithmetic would emit an inverted range
    ``effective_to = day - 1 < effective_from`` and duplicate
    ``effective_from`` values per key).  The collapse rides the same
    (key, ts) window sort as the run-length compression — Catalyst
    still plans ONE shuffle for the whole build.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    # keep only the last snapshot of each (key, day): a row survives
    # when the next row (same key) is on a different day or absent
    nxt_day = F.to_date(F.lead(ts_col).over(w))
    last_of_day = nxt_day.isNull() | (nxt_day != F.to_date(F.col(ts_col)))
    history = history.withColumn("_lod", last_of_day).filter("_lod").drop("_lod")
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
