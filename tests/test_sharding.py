"""Rendezvous sharding: the minimal-disruption invariants (add a
shard → keys stay or move ONLY to the new shard; remove one → only
its keys move), rough balance, determinism, cross-engine equality
(Spark == generated DuckDB oracle, which also pins the argmax/
tiebreak construction bit-for-bit), and validation."""

from __future__ import annotations

import duckdb
import pytest

from survivor_processing_spark.operators.sharding import (
    rendezvous_assign,
    rendezvous_oracle,
    rendezvous_summary,
)

SHARDS3 = ["s-a", "s-b", "s-c"]
SHARDS4 = SHARDS3 + ["s-d"]


def _assign(spark, n, shards):
    df = spark.range(n).withColumnRenamed("id", "k")
    return {
        r["k"]: r["shard"]
        for r in rendezvous_assign(df, "k", shards).collect()
    }


def test_add_shard_minimal_disruption(spark):
    before = _assign(spark, 400, SHARDS3)
    after = _assign(spark, 400, SHARDS4)
    moved = {k for k in before if before[k] != after[k]}
    # the HRW invariant is EXACT: a changed key can only have moved
    # to the new shard
    assert all(after[k] == "s-d" for k in moved)
    # expected 1/4 of keys move; allow generous slack on 400 keys
    assert 0.10 <= len(moved) / 400 <= 0.45


def test_remove_shard_only_its_keys_move(spark):
    before = _assign(spark, 400, SHARDS4)
    after = _assign(spark, 400, SHARDS3)
    for k, s in before.items():
        if s != "s-d":
            assert after[k] == s


def test_rough_balance_and_determinism(spark):
    a1 = _assign(spark, 600, SHARDS3)
    a2 = _assign(spark, 600, SHARDS3)
    assert a1 == a2
    counts = {s: 0 for s in SHARDS3}
    for s in a1.values():
        counts[s] += 1
    assert all(600 / 3 * 0.6 <= c <= 600 / 3 * 1.4 for c in counts.values())


def test_cross_engine_summary(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    got = sorted(
        map(tuple, rendezvous_summary(df, "k", SHARDS4).collect())
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            rendezvous_oracle(
                "SELECT range AS k FROM range(500)", "k", SHARDS4
            )
        ).fetchall()
    )
    assert got == want
    assert sum(n for _, n in got) == 500


def test_validation(spark):
    for bad in ([], ["a", "a"], ["a:b"], ["a'b"]):
        with pytest.raises(ValueError):
            rendezvous_summary(None, "k", bad)
