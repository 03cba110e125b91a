"""Hypothesis property tests for the final-r7 queued operators whose
correctness IS an algebraic invariant — shapes randomized search
finds that fixed fixtures miss:

- content_fingerprint: a multiset invariant — ANY permutation and
  ANY partitioning of the same rows fingerprint identically, and any
  single-row multiset change does not (modulo the documented 2^-60
  lane collision, which hypothesis will not find).
- rendezvous sharding: adding a shard moves keys ONLY to the new
  shard; removing one moves only its keys — exact, not statistical.
- mad_outlier_stats: inlier/outlier counts partition the group, and
  the output is invariant to input row order (tie-invariance of the
  nearest-rank statistics)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from survivor_processing_spark.operators.curation import mad_outlier_stats
from survivor_processing_spark.operators.fingerprint import (
    content_fingerprint,
)
from survivor_processing_spark.operators.sharding import rendezvous_assign

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.one_of(st.none(), st.text(alphabet="abc '", max_size=5)),
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(rows=ROWS, data=st.data())
def test_fingerprint_multiset_invariance(spark, rows, data):
    df = spark.createDataFrame(rows, "k long, s string")
    base = tuple(content_fingerprint(df, ["k", "s"]).collect()[0])
    perm = data.draw(st.permutations(rows))
    parts = data.draw(st.integers(min_value=1, max_value=8))
    df2 = spark.createDataFrame(list(perm), "k long, s string").repartition(
        parts
    )
    assert tuple(content_fingerprint(df2, ["k", "s"]).collect()[0]) == base


@settings(**SETTINGS)
@given(rows=ROWS, data=st.data())
def test_fingerprint_detects_single_row_change(spark, rows, data):
    df = spark.createDataFrame(rows, "k long, s string")
    base = tuple(content_fingerprint(df, ["k", "s"]).collect()[0])
    idx = data.draw(st.integers(min_value=0, max_value=len(rows) - 1))
    k, s = rows[idx]
    mutated = rows[:idx] + [(k + 1, s)] + rows[idx + 1 :]
    df2 = spark.createDataFrame(mutated, "k long, s string")
    assert tuple(content_fingerprint(df2, ["k", "s"]).collect()[0]) != base


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=80),
    k=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
def test_rendezvous_disruption_exact(spark, n, k, data):
    shards = [f"s{i}" for i in range(k)]
    new = "s-new"
    df = spark.range(n).withColumnRenamed("id", "key")
    before = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(df, "key", shards).collect()
    }
    after = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(df, "key", shards + [new]).collect()
    }
    for key in before:
        assert after[key] in (before[key], new)
    # removal symmetry: dropping the new shard restores exactly
    restored = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(df, "key", shards).collect()
    }
    assert restored == before


MADROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.one_of(st.none(), st.integers(min_value=-30, max_value=30)),
    ),
    min_size=1,
    max_size=50,
)


@settings(**SETTINGS)
@given(rows=MADROWS, data=st.data())
def test_mad_partition_and_order_invariance(spark, rows, data):
    df = spark.createDataFrame(rows, "g string, v long")
    base = sorted(map(tuple, mad_outlier_stats(df, ["g"], "v").collect()))
    for g, n, med, mad, n_out, isum in base:
        assert 0 <= n_out <= n
    perm = data.draw(st.permutations(rows))
    df2 = spark.createDataFrame(list(perm), "g string, v long")
    assert (
        sorted(map(tuple, mad_outlier_stats(df2, ["g"], "v").collect()))
        == base
    )
