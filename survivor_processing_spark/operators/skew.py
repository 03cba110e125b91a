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
from pyspark.sql import DataFrame, SparkSession, Window


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
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ sorted) table: pays the shuffle once
    at write time so every later equi-join or aggregation on ``keys``
    is exchange-free.  Pass ``path`` to land an EXTERNAL table at an
    explicit location (no dependence on the session's warehouse dir —
    bucketing metadata requires the catalog, so this is still
    ``saveAsTable``, but the data lives where the caller says)."""
    # Repartition on the bucket keys into n_buckets tasks first:
    # shuffle hash partitioning and bucket-id assignment use the same
    # pmod(murmur3) scheme, so each write task holds exactly one
    # bucket and the table lands as ONE file per bucket (without
    # this, every input task writes a file per bucket it touches —
    # tasks × buckets small files — and a single-row-group input
    # single-tasks the whole sort+encode).
    w = (
        df.repartition(n_buckets, *keys)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str]
) -> DataFrame:
    """Join two same-bucketed tables — the plan has no Exchange on
    either input (asserted in tests/test_skew_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), keys)


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_cols: list,
    k: int,
    salt_on: list[str],
    rank_col: str = "rank",
    n_salts: int = 32,
) -> DataFrame:
    """Skew-proof per-group top-k ranking (two-stage salted window).

    A plain ``row_number() OVER (PARTITION BY keys)`` sorts EVERY row
    of a group in one task — with few/hot groups (e.g. 25 nations
    over 100 TB of customers) that task is the job.  Here stage 1
    ranks within (keys, salt) — salt is a hash of ``salt_on``
    (a high-cardinality column like the row's id), so each group
    splits into ``n_salts`` bounded sorts — and keeps only the local
    top-k.  Stage 2 ranks the <= n_salts*k survivors per group: its
    per-group input is O(n_salts*k) rows REGARDLESS of group size, so
    the second window cannot be hot.  Output == the single-window
    top-k (any global top-k row is top-k within its salt bucket —
    pigeonhole), and ``order_cols`` must totally order rows (include
    a tiebreak) for determinism.  Both stages are JVM windows —
    whole-stage-codegen'd, no Python."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt.cast("int"))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("_salt", "_r1")
    )
