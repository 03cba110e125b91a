"""Fallback-cascade entity resolution.

The reference resolves names with a cascade: exact (season,
first_name) match → (first_name, last-initial) match → manual
correction dict → interactive pdb (reference:
episodes_transform.py:218-240 ``match_to_contestant_season``;
manual_additions confessional_transform.py:39-59; YAML overlay
episode_stats_transform.py:176-181).

Engine form: an ordered list of (dimension DataFrame, join keys)
attempts, each a *broadcast* left join, resolved with COALESCE in
attempt order; unresolved rows land in a quarantine flag instead of
pdb.  Corrections are data (a table), not code (a .replace chain) —
reference I3's ~30 chained .replace calls become one correction
table joined like any other attempt.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def resolve_cascade(
    df: DataFrame,
    attempts: list[tuple[DataFrame, list[str], str]],
    out_col: str,
    default=None,
) -> DataFrame:
    """Resolve ``out_col`` by trying each (dim, keys, dim_value_col)
    in order; first non-null wins.  Adds ``{out_col}_resolved_by``
    (attempt index, -1 = unresolved) for quarantine routing."""
    out = df
    picked = []
    for i, (dim, keys, val_col) in enumerate(attempts):
        alias = f"_attempt_{i}"
        dim_sel = dim.select(
            *[F.col(k) for k in keys], F.col(val_col).alias(alias)
        ).dropDuplicates(keys)
        out = out.join(F.broadcast(dim_sel), keys, "left")
        picked.append(F.col(alias))
    resolved = F.coalesce(*picked, F.lit(default)) if picked else F.lit(default)
    resolved_by = F.lit(-1)
    for i in range(len(picked) - 1, -1, -1):
        resolved_by = F.when(picked[i].isNotNull(), i).otherwise(resolved_by)
    out = out.withColumn(out_col, resolved).withColumn(
        f"{out_col}_resolved_by", resolved_by
    )
    return out.drop(*[f"_attempt_{i}" for i in range(len(picked))])
