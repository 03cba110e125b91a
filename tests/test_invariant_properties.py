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


# --- r8 additions: snapshot replay, SQ8 determinism, join shift ------------


@settings(**SETTINGS)
@given(
    n_files=st.integers(min_value=1, max_value=6),
    plan=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=5)),
        min_size=1,
        max_size=8,
    ),
)
def test_snapshot_replay_matches_reference(n_files, plan):
    """Any valid commit sequence replays to exactly the reference
    active set at EVERY version (pure-Python, no Spark needed)."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from survivor_processing_spark.operators.snapshot import (
        commit_version,
        snapshot_files,
    )

    d = tempfile.mkdtemp()
    try:
        names = []
        for i in range(n_files):
            nm = f"f{i}.parquet"
            pq.write_table(pa.table({"k": [i]}), os.path.join(d, nm))
            names.append(nm)
        active: set = set()
        history: dict[int, list[str]] = {}
        for add_first, pick in plan:
            inactive = sorted(set(names) - active)
            removable = sorted(active)
            adds = [inactive[pick % len(inactive)]] if inactive else []
            removes = (
                [removable[pick % len(removable)]]
                if (not add_first and removable)
                else []
            )
            if not adds and not removes:
                continue
            v = commit_version(d, adds=adds, removes=removes)
            active |= set(adds)
            active -= set(removes)
            history[v] = sorted(active)
        for v, want in history.items():
            assert snapshot_files(d, v) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.lists(
            st.floats(
                min_value=-4, max_value=4, allow_nan=False
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=25,
    ),
    data=st.data(),
)
def test_sq8_codes_partition_and_order_invariant(spark, rows, data):
    """SQ8 bounds are global aggregates and codes are pure per-row
    integer arithmetic — permuting rows or changing partitioning
    cannot change any vector's codes."""
    from survivor_processing_spark.operators.quantize import sq8_encode

    recs = [(i, v) for i, v in enumerate(rows)]
    df = spark.createDataFrame(recs, "vec_id long, embedding array<double>")
    base = {
        r["vec_id"]: list(r["codes"])
        for r in sq8_encode(df, dim=3).collect()
    }
    perm = data.draw(st.permutations(recs))
    parts = data.draw(st.integers(min_value=1, max_value=6))
    df2 = spark.createDataFrame(
        list(perm), "vec_id long, embedding array<double>"
    ).repartition(parts)
    again = {
        r["vec_id"]: list(r["codes"])
        for r in sq8_encode(df2, dim=3).collect()
    }
    assert again == base


@settings(**SETTINGS)
@given(
    lrows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1,
        max_size=20,
    ),
    rrows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1,
        max_size=20,
    ),
    shift=st.integers(min_value=0, max_value=100000),
)
def test_interval_join_time_shift_invariant(spark, lrows, rrows, shift):
    """Shifting BOTH sides' timestamps by the same delta preserves
    the interval-join pair set exactly (integer-second grid)."""
    from survivor_processing_spark.streaming.joins import (
        stream_interval_join,
    )

    def build(rows, idname, tsname, delta):
        return spark.createDataFrame(
            [(u, i, s + delta) for i, (u, s) in enumerate(rows)],
            f"user_id long, {idname} long, sec long",
        ).selectExpr(
            "user_id", idname, f"timestamp_seconds(sec) AS {tsname}"
        )

    def pairs(delta):
        out = stream_interval_join(
            build(lrows, "view_id", "view_ts", delta),
            build(rrows, "click_id", "click_ts", delta),
            keys=["user_id"],
            left_ts="view_ts",
            right_ts="click_ts",
            upper="600 seconds",
        )
        return sorted(
            (r["user_id"], r["view_id"], r["click_id"])
            for r in out.collect()
        )

    assert pairs(0) == pairs(shift)
