"""Unit tests for the round-3 analytics operators: binned range
join (vs the naive theta join), SCD2 run-length semantics, sketch
accuracy bounds, and the rebalance/keep-best curation queries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from survivor_processing_spark.operators.rangejoin import binned_range_join
from survivor_processing_spark.operators.scd2 import scd2_from_history


def _bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 10.5), ("c", 10.5, 200.0)],
        "band string, lo double, hi double",
    )


def _facts(spark):
    # boundary values on both sides of every edge + out-of-range
    vals = [0.0, 5.0, 9.999, 10.0, 10.4999, 10.5, 199.999, 200.0, -1.0, 250.0]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "fid int, value double"
    )


def test_binned_range_join_matches_naive_theta_join(spark):
    facts, bands = _facts(spark), _bands(spark)
    for width in (0.25, 7.0, 1000.0):
        got = binned_range_join(
            facts, bands, "value", "lo", "hi", bin_width=width
        ).select("fid", "band")
        naive = facts.join(
            bands, (facts.value >= bands.lo) & (facts.value < bands.hi)
        ).select("fid", "band")
        assert sorted(got.collect()) == sorted(naive.collect())


def test_binned_range_join_left_keeps_unmatched(spark):
    facts, bands = _facts(spark), _bands(spark)
    got = binned_range_join(
        facts, bands, "value", "lo", "hi", bin_width=5.0, how="left"
    )
    assert got.count() == facts.count()
    unmatched = got.filter(F.col("band").isNull()).select("value")
    assert sorted(r.value for r in unmatched.collect()) == [-1.0, 200.0, 250.0]


def test_binned_range_join_rejects_bad_args(spark):
    facts, bands = _facts(spark), _bands(spark)
    with pytest.raises(ValueError, match="bin_width"):
        binned_range_join(facts, bands, "value", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError, match="how"):
        binned_range_join(facts, bands, "value", "lo", "hi", 1.0, how="full")


def test_binned_range_join_is_broadcast_hash_join(spark):
    facts, bands = _facts(spark), _bands(spark)
    plan = (
        binned_range_join(facts, bands, "value", "lo", "hi", bin_width=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _history(spark):
    rows = [
        # k1: A A B B A  -> 3 ranges (RLE compresses the repeats)
        (1, "2020-01-01", "A"),
        (1, "2020-02-01", "A"),
        (1, "2020-03-01", "B"),
        (1, "2020-04-01", "B"),
        (1, "2020-05-01", "A"),
        # k2: never changes -> 1 open range
        (2, "2020-01-15", "X"),
        (2, "2021-01-15", "X"),
        # k3: null -> value -> null are all real changes
        (3, "2020-01-01", None),
        (3, "2020-06-01", "Z"),
        (3, "2020-07-01", None),
    ]
    return spark.createDataFrame(
        rows, "k int, ts string, attr string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_scd2_run_length_compression(spark):
    out = scd2_from_history(_history(spark), ["k"], "ts", ["attr"])
    rows = {(r.k, r.effective_from): r for r in out.collect()}
    assert len(rows) == 3 + 1 + 3
    # k1 ranges chain with no gaps/overlaps (closed intervals, day grain)
    k1 = sorted(
        (r for r in rows.values() if r.k == 1), key=lambda r: r.effective_from
    )
    assert [(r.attr, r.effective_from, r.effective_to) for r in k1] == [
        ("A", "2020-01-01", "2020-02-29"),
        ("B", "2020-03-01", "2020-04-30"),
        ("A", "2020-05-01", "9999-12-31"),
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    # k2 collapsed to one current row
    k2 = [r for r in rows.values() if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].attr == "X"
    # k3: leading null attr is a real first version
    k3 = sorted(
        (r for r in rows.values() if r.k == 3), key=lambda r: r.effective_from
    )
    assert [r.attr for r in k3] == [None, "Z", None]


def test_scd2_same_day_changes_collapse_to_last(spark):
    """Several changes on one calendar day yield ONE day-grain range
    carrying the day's LAST value — never an inverted closed interval
    (effective_to < effective_from) or duplicate effective_from."""
    rows = [
        # three changes on 2020-01-01, then a change the next day,
        # then two more same-day changes at the end of history
        (1, "2020-01-01 08:00:00", "A"),
        (1, "2020-01-01 12:00:00", "B"),
        (1, "2020-01-01 18:00:00", "C"),
        (1, "2020-01-02 09:00:00", "D"),
        (1, "2020-03-01 01:00:00", "E"),
        (1, "2020-03-01 02:00:00", "F"),
    ]
    hist = spark.createDataFrame(
        rows, "k int, ts string, attr string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        scd2_from_history(hist, ["k"], "ts", ["attr"]).collect(),
        key=lambda r: r.effective_from,
    )
    assert [(r.attr, r.effective_from, r.effective_to) for r in out] == [
        ("C", "2020-01-01", "2020-01-01"),
        ("D", "2020-01-02", "2020-02-29"),
        ("F", "2020-03-01", "9999-12-31"),
    ]
    for r in out:
        assert r.effective_from <= r.effective_to
    assert [r.is_current for r in out] == [False, False, True]


def test_scd2_exactly_one_current_per_key(spark):
    out = scd2_from_history(_history(spark), ["k"], "ts", ["attr"])
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    assert len(cur) == 3


def test_sketch_accuracy_vs_exact(spark, sf_dir):
    from survivor_processing_spark.queries.analytics import (
        sketch_distinct_quantiles,
    )
    from survivor_processing_spark.catalog import load_table

    # the registered query IS the accuracy contract now: every
    # within-tolerance boolean must be TRUE (r6 error-bound gate)
    gated = sketch_distinct_quantiles(spark, sf_dir).collect()
    assert gated and all(
        r.users_within_tol
        and r.p50_within_tol
        and r.p90_within_tol
        and r.p99_within_tol
        for r in gated
    )
    # raw sketch values, pinned against exact here (they no longer
    # appear in the gated output — engine-specific by construction)
    ev = load_table(spark, sf_dir, "events")
    sk = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("aq"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("q"),
        )
        .collect()
    }
    assert set(sk) == set(exact)
    for et, e in exact.items():
        s = sk[et]
        assert abs(s.approx_users - e.nd) <= max(2, 0.05 * e.nd)
        # percentile_approx(acc=10k) is rank-exact on these sizes up to
        # interpolation: exact percentile interpolates, approx returns a
        # data value — allow a loose absolute corridor
        assert abs(s.aq[0] - e.q[0]) < 15.0
        assert abs(s.aq[1] - e.q[1]) < 30.0


def test_domain_rebalance_cap_and_determinism(spark, sf_dir):
    from survivor_processing_spark.queries.corpus import domain_rebalance_sample

    a = domain_rebalance_sample(spark, sf_dir)
    counts = a.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in counts)
    b = domain_rebalance_sample(spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_near_dup_keep_best_one_winner_per_component(spark, sf_dir):
    from survivor_processing_spark.queries.corpus import near_dup_keep_best

    out = near_dup_keep_best(spark, sf_dir)
    per_comp = (
        out.groupBy("component_id")
        .agg(
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert all(r.n_kept == 1 for r in per_comp)
    # every doc labeled exactly once
    assert out.select("doc_id").distinct().count() == out.count()


def test_geo_mean_udaf_matches_sql_formula(spark, sf_dir):
    import math

    import pyspark.sql.functions as F

    from survivor_processing_spark.catalog import load_table
    from survivor_processing_spark.queries.analytics import geo_mean_udaf

    got = {r.event_type: r.geo_mean_value
           for r in geo_mean_udaf(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: math.exp(r.m) - 1.0
        for r in ev.groupBy("event_type")
        .agg(F.avg(F.log1p("value")).alias("m"))
        .collect()
    }
    assert set(got) == set(exact)
    # the UDAF emits round(·, 6) (hash-safety: integer log-lane +
    # 6-decimal output), so the bound is the rounding quantum plus
    # the 1e-12 per-element lane resolution
    for k in got:
        assert abs(got[k] - exact[k]) < 1e-6


def test_observed_quality_metrics_ride_the_single_pass(spark, sf_dir):
    import pyspark.sql.functions as F

    from survivor_processing_spark.catalog import load_table
    from survivor_processing_spark.functions.observe import observed_quality

    ev = load_table(spark, sf_dir, "events").withColumn(
        "maybe", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    )
    observed, obs = observed_quality(ev, null_cols=["maybe", "props"])
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    expected_nulls = ev.filter(F.col("maybe").isNull()).count()
    assert got["n_null_maybe"] == expected_nulls
    assert got["n_null_props"] == ev.filter(F.col("props").isNull()).count()
