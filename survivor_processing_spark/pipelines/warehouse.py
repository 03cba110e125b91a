"""Warehouse: the 16 keyed target tables + per-pipeline load drivers.

Conflict keys are the reference's upsert keys verbatim (SURVEY.md
§1.2; reference *_load.py files), including composite keys where
NULL-filled parts participate (reference K3 semantics — callers
fill before merging).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sinks.merge import MergeTable

# table -> upsert conflict key columns (reference §1.2)
CONFLICT_KEYS: dict[str, list[str]] = {
    "season": ["season_id"],
    "episode": ["episode_id"],
    "contestant": ["contestant_id"],
    "contestant_season": ["contestant_season_id"],
    "tribe": ["tribe_id"],
    "alliance": ["alliance_id"],
    "voting_confessional": ["voter_id", "season", "episode_id", "content"],
    "final_words": ["contestant_id", "season", "episode_id", "content"],
    "story_quotes": ["season", "episode_id", "content"],
    "vote": ["season_id", "episode_id", "tc_number", "contestant_id", "vote_number"],
    "reward_challenge": [
        "tc_number",
        "season_id",
        "contestant_id",
        "episode_id",
        "challenge_number",
    ],
    "immunity_challenge": ["tc_number", "season_id", "contestant_id", "episode_id"],
    "episode_performance_stats": ["episode_id", "contestant_id", "season_id"],
    "confessional": ["day", "n_in_episode", "episode_id", "contestant_id"],
    "reddit_submissions": ["id"],
    "reddit_comments": ["id"],
}


class Warehouse:
    """Parquet-backed warehouse rooted at a directory; one MergeTable
    per §1.2 table.  ``load`` is the B3 driver: iterate (table, frame)
    pairs and MERGE each on its conflict keys — re-runs are idempotent
    (N3)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> MergeTable:
        if name not in CONFLICT_KEYS:
            raise KeyError(f"unknown warehouse table {name!r}")
        return MergeTable(
            self.spark, os.path.join(self.root, name), CONFLICT_KEYS[name]
        )

    def read(self, name: str) -> DataFrame:
        return self.table(name).read()

    def load(self, outputs: dict[str, DataFrame]) -> None:
        for name, df in outputs.items():
            self.table(name).merge(df)
