"""MERGE-style keyed upsert sink.

The reference's only sink is a keyed upsert: write to a temp table,
then ``INSERT … ON CONFLICT (keys) DO UPDATE SET col = excluded.col``
(reference: helpers/load_helpers.py:4-39); every pipeline re-run is
therefore idempotent (SURVEY.md §2.N3).  The engine's equivalent:

* With Delta Lake (or Iceberg) on a cluster: ``MERGE INTO target
  USING source ON keys WHEN MATCHED THEN UPDATE SET * WHEN NOT
  MATCHED THEN INSERT *`` — that is the production path and the
  one-liner this module would reduce to.
* Here (vanilla Spark + parquet, no Delta in the container): the
  classic union + window-dedup + atomic-swap overwrite.  Source rows
  win over target rows on key collision (``_src_priority``); the
  swap is staging-dir + rename so a failed job never corrupts the
  table.  Scale note: the window partitions by the merge keys — the
  same shuffle a MERGE's join would do; no driver-side data movement.

Upsert key semantics preserved exactly, including the reference's
fillna-on-keys behavior (K3: NULL key parts participate after a
constant fill — callers fill before merging, as the reference does).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


class MergeTable:
    """A parquet-backed keyed table with MERGE upsert semantics."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def merge(self, source: DataFrame) -> None:
        merge_upsert(self.spark, self.path, source, self.keys)


def merge_upsert(
    spark: SparkSession, target_path: str, source: DataFrame, keys: list[str]
) -> None:
    """Upsert ``source`` into the parquet table at ``target_path`` on
    ``keys``.  Last-writer-wins per key (source beats target), ties
    within the source resolved deterministically by key order."""
    table = MergeTable(spark, target_path, keys)
    if not table.exists():
        merged = source.dropDuplicates(keys)
        _atomic_overwrite(spark, merged, target_path)
        return

    target = spark.read.parquet(target_path)
    src = source.withColumn("_src_priority", F.lit(0))
    tgt = target.withColumn("_src_priority", F.lit(1))
    unioned = src.unionByName(tgt, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.asc("_src_priority"))
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_priority")
    )
    _atomic_overwrite(spark, merged, target_path)


def _atomic_overwrite(spark: SparkSession, df: DataFrame, target_path: str) -> None:
    """Write to a staging dir, then swap — the reader of the old data
    is never the writer's victim (parquet can't overwrite in place
    while being read)."""
    staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    backup = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(target_path):
        os.rename(target_path, backup)
    os.rename(staging, target_path)
    if os.path.isdir(backup):
        shutil.rmtree(backup, ignore_errors=True)
