"""Episodes pipeline transform (reference
episodes_transform.py:269-311).

Input: one row per episode with viewership/share/number text fields
and three dict-of-lists cells (voting_confessionals, final_words,
story_quotes).  Output: the ``episode`` dimension plus three
exploded quote tables (L1), with speaker names resolved against the
contestant_season dimension (D4 broadcast lookup).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _explode_quotes(
    df: DataFrame, map_col: str, name_dim: DataFrame, id_out: str
) -> DataFrame:
    """dict-of-lists cell -> one row per (speaker, quote) (reference
    episodes_transform.py:83-119 create_dict_based_df): explode the
    map, explode the values, broadcast-resolve speaker -> id."""
    rows = (
        df.select(
            "season",
            "episode_id",
            F.explode_outer(F.col(map_col)).alias("speaker", "quotes"),
        )
        .select(
            "season",
            "episode_id",
            "speaker",
            F.explode_outer("quotes").alias("content"),
        )
        .filter(F.col("content").isNotNull())
    )
    dim = name_dim.select(
        F.lower(F.col("full_name")).alias("_speaker_lc"),
        F.col("season").alias("_dim_season"),
        F.col("contestant_season_id").alias(id_out),
    )
    return (
        rows.join(
            F.broadcast(dim),
            (F.lower(rows["speaker"]) == dim["_speaker_lc"])
            & (rows["season"] == dim["_dim_season"]),
            "left",
        )
        .select("season", "episode_id", id_out, "content")
    )


def transform_episodes(
    raw: DataFrame, name_dim: DataFrame
) -> dict[str, DataFrame]:
    episode = raw.select(
        F.col("episode_id").cast("long"),
        "season",
        F.col("title"),
        F.to_timestamp("firstbroadcast").alias("firstbroadcast"),
        # '5.1/9 (18-49)' -> rating/share (reference :24-31)
        F.regexp_extract("share_txt", r"(\d+\.?\d*)", 1)
        .cast("double")
        .alias("overall_rating"),
        # 'Unavailable'/'N/A' -> NULL before the viewership parse
        # (I5), then '(d.dd)' x 1e8 (I6, transform_helpers.py:63-70)
        (
            F.regexp_extract(
                F.when(
                    F.col("viewership_txt").isin("Unavailable", "N/A"), None
                ).otherwise(F.col("viewership_txt")),
                r"(\d+\.\d+)",
                1,
            ).cast("double")
            * F.lit(1e8)
        ).alias("viewership"),
        # '7/14 (8)' -> number_in_season, number_overall (reference :7-17)
        F.regexp_extract("number_txt", r"(\d+)/\d+", 1)
        .cast("long")
        .alias("number_in_season"),
        F.regexp_extract("number_txt", r"\d+/\d+ ?\(?(\d+)?\)?", 1)
        .cast("long")
        .alias("number_overall"),
    )

    vc = _explode_quotes(raw, "voting_confessionals", name_dim, "voter_id")
    fw = _explode_quotes(raw, "final_words", name_dim, "contestant_id")
    sq = (
        raw.select(
            "season",
            "episode_id",
            F.explode_outer("story_quotes").alias("_speaker", "quotes"),
        )
        .select("season", "episode_id", F.explode_outer("quotes").alias("content"))
        .filter(F.col("content").isNotNull())
    )
    return {
        "episode": episode,
        "voting_confessional": vc,
        "final_words": fw,
        "story_quotes": sq,
    }
