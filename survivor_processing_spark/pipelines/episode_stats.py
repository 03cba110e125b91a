"""Episode-stats pipeline transform (reference
episode_stats_transform.py:173-193).

Input: the 4-frame dict the xlsx region scan produces
(tribal_council, reward_challenge, immunity_challenge,
overall_episode) plus the name→contestant_season map (DB-derived,
YAML-corrected — A10/D4).  Output: 4 keyed fact tables with the
reference's coalesce defaults (K1), fillna-on-key semantics (K3),
revote disambiguation window (F2), and the groupby-sum collapse
(E5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _with_ids(df: DataFrame, name_map: DataFrame, name_col: str) -> DataFrame:
    """Broadcast merge-key lookup (reference :13-15 builds
    'first_last_season' keys; D4)."""
    dim = name_map.select(
        F.col("merge_key").alias("_mk"), F.col("contestant_season_id")
    )
    return (
        df.withColumn(
            "_mk",
            F.concat_ws("_", F.lower(F.col(name_col)), F.col("season_id").cast("string")),
        )
        .join(F.broadcast(dim), "_mk", "left")
        .drop("_mk")
    )


def transform_episode_stats(
    frames: dict[str, DataFrame], name_map: DataFrame
) -> dict[str, DataFrame]:
    tc = frames["tribal_council"]
    rc = frames["reward_challenge"]
    ic = frames["immunity_challenge"]
    ep = frames["overall_episode"]

    # --- immunity challenge (reference ic_transform :8-29) ----------
    ic_out = (
        _with_ids(ic, name_map, "contestant")
        .withColumn("win", F.coalesce("win", "win_alt", F.lit(1)).cast("double"))
        .withColumn("win_pct", F.coalesce("win_pct", F.lit(0.25)).cast("double"))
        .filter(F.col("episode_id").isNotNull())
        .withColumn("tc_number", F.coalesce("tc_number", F.lit(0)).cast("long"))
        .select(
            "season_id", "episode_id", "tc_number", "contestant_season_id",
            F.col("contestant_season_id").alias("contestant_id"),
            "win", "win_pct",
        )
    )

    # --- reward challenge (reference rc_transform :40-61) -----------
    rc_out = (
        _with_ids(rc, name_map, "contestant")
        .withColumn("win_pct", F.coalesce("win_pct", F.lit(0.25)).cast("double"))
        .withColumn("team", F.coalesce("team", F.lit(4)).cast("double"))
        .withColumn(
            "episode_win_pct", F.coalesce("episode_win_pct", F.lit(1.25)).cast("double")
        )
        .withColumn("tc_number", F.coalesce("tc_number", F.lit(0)).cast("long"))
        .withColumn("challenge_number", F.coalesce("challenge_number", F.lit(1)).cast("long"))
        .filter(F.col("episode_id").isNotNull())
        .select(
            "season_id", "episode_id", "tc_number", "challenge_number",
            F.col("contestant_season_id").alias("contestant_id"),
            "win_pct", "team", "episode_win_pct",
        )
    )

    # --- tribal council votes (reference tc_transform :64-87) -------
    votes = (
        _with_ids(tc, name_map, "voter")
        .withColumnRenamed("contestant_season_id", "contestant_id")
        .withColumn(
            "_vk",
            F.concat_ws(
                "_", F.lower(F.col("voted_for")), F.col("season_id").cast("string")
            ),
        )
        .join(
            F.broadcast(
                name_map.select(
                    F.col("merge_key").alias("_vk"),
                    F.col("contestant_season_id").alias("voted_for_id"),
                )
            ),
            "_vk",
            "left",
        )
        .drop("_vk")
        .filter(F.col("episode_id").isNotNull() & F.col("voted_for").isNotNull())
        .withColumn("tc_number", F.coalesce("tc_number", F.lit(0)).cast("long"))
    )
    # revote disambiguation: rank within (season, episode, tc,
    # contestant) by remaining players, stable tiebreak on voted_for
    # (F2 — reference rank(method='first'))
    w = Window.partitionBy(
        "season_id", "episode_id", "tc_number", "contestant_id"
    ).orderBy(F.desc("total_players_remaining"), F.asc("voted_for"))
    vote_out = votes.withColumn(
        "vote_number", F.row_number().over(w).cast("long")
    ).select(
        "season_id", "episode_id", "tc_number", "contestant_id",
        "vote_number", "voted_for_id", "vote_counted",
    )

    # --- overall performance stats (reference overall_transform
    # :90-137: rename map, key join, filter, groupby-sum E5) ---------
    ep_ids = _with_ids(ep, name_map, "contestant").filter(
        F.col("challenge_wins").isNotNull()
    )
    keys = ["episode_id", "contestant_season_id", "season_id"]
    measures = [
        c
        for c, t in ep_ids.dtypes
        if c not in keys + ["contestant"] and t in ("double", "bigint", "int")
    ]
    ep_out = (
        ep_ids.groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
        .withColumnRenamed("contestant_season_id", "contestant_id")
    )

    return {
        "immunity_challenge": ic_out,
        "reward_challenge": rc_out,
        "vote": vote_out,
        "episode_performance_stats": ep_out,
    }
