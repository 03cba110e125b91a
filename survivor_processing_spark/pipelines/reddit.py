"""Reddit pipeline transform (reference reddit_transform.py:49-89).

Input: submissions/comments event frames with epoch-seconds
``created_utc`` and semi-structured payload cells.  Output: the two
event tables enriched with most_recent_season / most_recent_episode
via *as-of* joins to the season/episode dimensions (D5), season
containment NULL-out (D6), complex cells stringified to JSON (L5).
One lazy plan end-to-end; the as-of joins broadcast the dimensions —
the 100 TB-safe shape for a large event stream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.asof import asof_join


def _enrich(
    events: DataFrame, seasons: DataFrame, episodes: DataFrame
) -> DataFrame:
    ev = events.withColumn("created_dt", F.timestamp_seconds("created_utc"))

    sdim = seasons.select(
        F.col("season_id").alias("most_recent_season"),
        "showing_started",
        "showing_ended",
    )
    ev = asof_join(ev, sdim, "created_dt", "showing_started", strategy="broadcast")

    edim = episodes.select(
        F.col("episode_id").alias("most_recent_episode"), "firstbroadcast"
    )
    ev = asof_join(ev, edim, "created_dt", "firstbroadcast", strategy="broadcast")

    # containment: a post after the matched season ended belongs to no
    # season — NULL the payload, keep the row (reference :28-34)
    outside = F.col("created_dt") > F.col("showing_ended")
    ev = ev.withColumn(
        "most_recent_season",
        F.when(outside, F.lit(None)).otherwise(F.col("most_recent_season")),
    )
    return ev.drop("showing_started", "showing_ended", "firstbroadcast")


def transform_reddit(
    submissions: DataFrame,
    comments: DataFrame,
    seasons: DataFrame,
    episodes: DataFrame,
) -> dict[str, DataFrame]:
    out = {}
    for name, df in (
        ("reddit_submissions", submissions),
        ("reddit_comments", comments),
    ):
        enriched = _enrich(df, seasons, episodes)
        # complex payload cells -> JSON strings before load (L5,
        # reference :76-81 stringifies dict/list cells)
        for field in enriched.schema.fields:
            if field.dataType.typeName() in ("array", "map", "struct"):
                enriched = enriched.withColumn(field.name, F.to_json(field.name))
        out[name] = enriched
    return out
