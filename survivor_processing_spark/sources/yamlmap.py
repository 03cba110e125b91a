"""YAML lookup-table source + correction overlay (SURVEY.md §2 A10).

The reference loads a 1,272-entry hand-maintained name→id correction
map and lays it over the DB-derived map (reference
episode_stats_transform.py:176-181).  As data, not code: the map
becomes a small DataFrame, broadcast-joined, with
``coalesce(manual, derived)`` precedence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def yaml_lookup_df(
    spark: SparkSession,
    path: str,
    key_col: str = "name",
    value_col: str = "mapped_id",
) -> DataFrame:
    """Flat YAML mapping file → two-column DataFrame.  The file is
    driver-read (it is a hand-maintained dimension, KBs not TBs) and
    parallelized; downstream use is always a broadcast join."""
    import yaml

    with open(path) as f:
        mapping = yaml.safe_load(f) or {}
    rows = [(str(k), v) for k, v in mapping.items()]
    return spark.createDataFrame(rows, schema=f"{key_col} string, {value_col} long")


def correction_overlay(
    df: DataFrame,
    corrections: DataFrame,
    on: str,
    target: str,
    corrected: str,
) -> DataFrame:
    """Overlay manual corrections: left-broadcast-join ``corrections``
    on ``on`` and take ``coalesce(correction, existing)`` as
    ``target`` (reference semantics: the YAML map wins where
    present)."""
    return (
        df.join(F.broadcast(corrections), on, "left")
        .withColumn(target, F.coalesce(F.col(corrected), F.col(target)))
        .drop(corrected)
    )
