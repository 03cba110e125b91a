"""heavy_hitters_exact: the Misra-Gries containment guarantee on
random and adversarial streams — output must EQUAL the exact
heavy-hitter set (keys with count*k > total) with exact counts."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from survivor_processing_spark.operators.heavyhitters import (
    heavy_hitters_exact,
)


def _exact(values, k):
    c = Counter(values)
    n = len(values)
    return {kk: v for kk, v in c.items() if v * k > n}


def _run(spark, values, k, n_parts=8, m=None):
    df = spark.createDataFrame(
        [(v,) for v in values], "term string"
    ).repartition(n_parts)
    out = heavy_hitters_exact(df, "term", k=k, m=m)
    return {r["term"]: r["n_occurrences"] for r in out.collect()}


def test_zipf_stream_matches_exact(spark):
    rng = random.Random(7)
    vals = [f"w{int(rng.paretovariate(1.2))}" for _ in range(5000)]
    for k in (5, 20, 100):
        assert _run(spark, vals, k) == _exact(vals, k)


def test_all_distinct_no_heavy_hitters(spark):
    vals = [f"u{i}" for i in range(500)]
    assert _run(spark, vals, 10) == {}


def test_single_dominant_key(spark):
    vals = ["hot"] * 900 + [f"c{i}" for i in range(100)]
    assert _run(spark, vals, 2) == {"hot": 900}


def test_boundary_strictly_greater(spark):
    # count*k == total must NOT qualify (strict >): 4 keys x 25 each,
    # k=4 -> 25*4 == 100, nobody passes
    vals = [w for w in ("a", "b", "c", "d") for _ in range(25)]
    assert _run(spark, vals, 4) == {}
    # k=5: 25*5 = 125 > 100 -> all four pass
    assert _run(spark, vals, 5) == {"a": 25, "b": 25, "c": 25, "d": 25}


def test_adversarial_decrement_churn(spark):
    # m distinct light keys per heavy occurrence forces constant MG
    # decrements; the heavy key must still survive in its partition
    rng = random.Random(11)
    vals = []
    for i in range(300):
        vals.append("heavy")
        vals.extend(f"x{rng.randrange(10_000)}" for _ in range(6))
    assert _run(spark, vals, 10, n_parts=4)["heavy"] == 300


def test_many_partitions_small_data(spark):
    vals = ["a"] * 10 + ["b"]
    assert _run(spark, vals, 2, n_parts=32) == {"a": 10}


def test_larger_m_same_answer(spark):
    rng = random.Random(3)
    vals = [f"w{int(rng.paretovariate(1.5))}" for _ in range(2000)]
    assert _run(spark, vals, 10) == _run(spark, vals, 10, m=50) == _exact(
        vals, 10
    )


def test_bad_params_raise(spark):
    df = spark.createDataFrame([("a",)], "term string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "term", k=0)
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "term", k=10, m=5)
