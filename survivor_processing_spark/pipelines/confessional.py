"""Confessional pipeline transform (reference
confessional_transform.py:36-67).

Input: parsed .docx confessional rows (sources/docx.py is the
extract stage).  Output: the ``confessional`` fact — contestant
resolved by lowercase name within season (D4), manual-correction
cascade for the stragglers (D9 as data), integer casts (K7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.resolve import resolve_cascade


def transform_confessional(
    raw: DataFrame,
    contestant_dim: DataFrame,
    manual_additions: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """``raw``: (season, episode, contestant, n_in_episode,
    total_in_episode, content, day, para_order).
    ``contestant_dim``: (season, first_name, contestant_id).
    ``manual_additions``: optional (season, name_lc, contestant_id)
    correction table (reference manual_additions :39-59 — data, not
    code)."""
    base = raw.withColumn("_name_lc", F.lower(F.col("contestant")))

    exact = contestant_dim.select(
        "season",
        F.lower(F.col("first_name")).alias("_name_lc"),
        F.col("contestant_id").alias("cid"),
    )
    attempts = [(exact, ["season", "_name_lc"], "cid")]
    if manual_additions is not None:
        manual = manual_additions.select(
            "season", F.col("name_lc").alias("_name_lc"), F.col("contestant_id").alias("mid")
        )
        attempts.append((manual, ["season", "_name_lc"], "mid"))

    resolved = resolve_cascade(base, attempts, "contestant_id")

    out = resolved.select(
        F.col("season").cast("long"),
        F.col("episode").cast("long").alias("episode_id"),
        F.col("contestant_id").cast("long"),
        F.col("day").cast("long"),
        F.col("n_in_episode").cast("long"),
        F.col("total_in_episode").cast("long").alias(
            "total_confessionals_in_episode"
        ),
        "content",
        F.col("contestant_id_resolved_by").alias("_resolved_by"),
    )
    # unresolved rows -> quarantine (reference dropped into pdb;
    # a distributed engine routes them to a table instead)
    return {
        "confessional": out.filter(F.col("_resolved_by") >= 0).drop("_resolved_by"),
        "confessional_quarantine": out.filter(F.col("_resolved_by") < 0).drop(
            "_resolved_by"
        ),
    }
