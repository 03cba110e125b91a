"""Contestant pipeline transform (reference
contestant_transform.py:155-226) — the widest plan: vertical split
of contestant vs contestant_season columns, attempt-indexed tribe /
alliance list expansion (L2/L3), opponents name→id join (D3), and
the flagship aggregate join (D2 against db_funcs.py:4-45).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _numbered(col: str, n: int, out_prefix: str) -> list:
    """list cell -> fixed-width numbered columns, NULL-padded (L2,
    reference contestant_transform.py:117-152)."""
    return [
        F.try_element_at(F.col(col), F.lit(i + 1)).alias(f"{out_prefix}_{i}") for i in range(n)
    ]


def transform_contestants(
    raw: DataFrame,
    tribe_dim: DataFrame,
    agg_stats: DataFrame,
) -> dict[str, DataFrame]:
    """``raw``: one row per (contestant, season attempt) with
    ``contestant_id``, ``contestant_season_id``, profile fields,
    ``tribes``/``alliances``/``opponents`` array cells.
    ``tribe_dim``: (name, tribe_id).  ``agg_stats``: the flagship
    aggregate keyed by contestant_season_id."""
    # vertical split (reference :157-183): stable person attributes
    # vs per-season attributes
    contestant = raw.select(
        "contestant_id", "first_name", "last_name", "sex", "birthdate"
    ).dropDuplicates(["contestant_id"])

    # attempt-indexed tribe families (L3): the reference keeps
    # tribes/tribes2.. column families picked by attempt_number; the
    # engine keeps ONE array column — already attempt-selected
    # upstream — and projects numbered columns only at the sink
    cs = raw.select(
        "contestant_season_id",
        "contestant_id",
        "season_id",
        F.col("opponents"),
        *_numbered("tribes", 4, "tribe"),
        *_numbered("alliances", 3, "alliance"),
    )

    # opponents: explode names -> broadcast tribe lookup -> positional
    # columns (D3, reference :102-114)
    opp = (
        cs.select(
            "contestant_season_id",
            F.posexplode_outer("opponents").alias("_pos", "_name"),
        )
        .join(
            F.broadcast(
                tribe_dim.select(
                    F.col("name").alias("_name"), F.col("tribe_id").alias("_opp_id")
                )
            ),
            "_name",
            "left",
        )
        .groupBy("contestant_season_id")
        .pivot("_pos", [0, 1, 2])
        .agg(F.first("_opp_id"))
        .select(
            "contestant_season_id",
            F.col("0").alias("opponent_0"),
            F.col("1").alias("opponent_1"),
            F.col("2").alias("opponent_2"),
        )
    )

    contestant_season = (
        cs.drop("opponents")
        .join(opp, "contestant_season_id", "left")
        .join(agg_stats, "contestant_season_id", "left")
    )
    return {"contestant": contestant, "contestant_season": contestant_season}
