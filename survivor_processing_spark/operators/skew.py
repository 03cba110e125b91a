"""Skew-resilient and co-located join strategies (SURVEY.md §7
Phase 7; the 100 TB playbook beyond AQE).

* ``salted_join`` — explicit salting for joins whose key histogram
  is pathological enough that AQE's skew splitting isn't available
  (e.g. the skewed side feeds an aggregation, or stats are absent):
  the fact side gets a deterministic salt in [0, n); the dimension
  side is exploded n ways; the join key becomes (keys…, salt), so
  one hot key spreads over n reducers.  Output is identical to the
  unsalted join.
* ``write_bucketed`` / ``bucketed_join`` — co-located joins: two
  tables bucketed by the same keys into the same bucket count join
  with NO exchange on either side (the classic repeated-join
  amortization: shuffle once at write time, never again).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with a salted key.  Salt on the fact side is a
    deterministic hash of the full row position-independent content
    via xxhash64 over all columns — stable across retries, uniform
    across rows sharing a hot key."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, keys + ["_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 32
) -> None:
    """Persist as a bucketed (+ sorted) managed table: pays the
    shuffle once at write time so every later equi-join or
    aggregation on ``keys`` is exchange-free."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str]
) -> DataFrame:
    """Join two same-bucketed tables — the plan has no Exchange on
    either input (asserted in tests/test_skew_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), keys)
