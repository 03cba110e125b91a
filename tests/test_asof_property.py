"""Property tests: both as-of strategies agree with each other and
with DuckDB's native ASOF LEFT JOIN on random inputs (SURVEY.md §7
Phase 4), including duplicate timestamps, facts before the first
dim row, exact-tie matches, and empty dimensions."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from survivor_processing_spark.operators.asof import asof_join

TS = st.integers(min_value=0, max_value=10_000)


def _oracle(facts: list[int], dims: list[int]) -> dict[int, int | None]:
    """DuckDB ASOF LEFT JOIN (greatest dim ts <= fact ts)."""
    con = duckdb.connect()
    con.register("f", pd.DataFrame({"ft": facts, "idx": range(len(facts))}))
    con.register("d", pd.DataFrame({"dt": list(set(dims))}))
    rows = con.execute(
        "SELECT idx, dt FROM f ASOF LEFT JOIN d ON f.ft >= d.dt"
    ).fetchall()
    return {idx: dt for idx, dt in rows}


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(TS, min_size=1, max_size=40),
    dims=st.lists(TS, min_size=0, max_size=25),
)
def test_asof_matches_duckdb(spark, strategy, facts, dims):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(facts)], "idx long, ft long"
    )
    right = spark.createDataFrame(
        [(t,) for t in sorted(set(dims))], "dt long"
    )
    if not dims and strategy == "union":
        # union strategy with an empty right side is exercised in
        # test_asof.py; hypothesis shrinks here explode runtime
        return
    out = asof_join(left, right, "ft", "dt", strategy=strategy,
                    allow_unkeyed_union=True)
    got = {r.idx: r.dt for r in out.collect()}
    assert got == _oracle(facts, dims)


def _oracle_forward(facts: list[int], dims: list[int]) -> dict[int, int | None]:
    """DuckDB ASOF LEFT JOIN, forward (smallest dim ts >= fact ts)."""
    con = duckdb.connect()
    con.register("f", pd.DataFrame({"ft": facts, "idx": range(len(facts))}))
    con.register("d", pd.DataFrame({"dt": list(set(dims))}))
    rows = con.execute(
        "SELECT idx, dt FROM f ASOF LEFT JOIN d ON f.ft <= d.dt"
    ).fetchall()
    return {idx: dt for idx, dt in rows}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(TS, min_size=1, max_size=40),
    dims=st.lists(TS, min_size=1, max_size=25),
)
def test_asof_forward_matches_duckdb(spark, facts, dims):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(facts)], "idx long, ft long"
    )
    right = spark.createDataFrame(
        [(t,) for t in sorted(set(dims))], "dt long"
    )
    out = asof_join(
        left, right, "ft", "dt", strategy="union", direction="forward",
        allow_unkeyed_union=True,
    )
    got = {r.idx: r.dt for r in out.collect()}
    assert got == _oracle_forward(facts, dims)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(TS, min_size=1, max_size=40),
    dims=st.lists(TS, min_size=1, max_size=25),
)
def test_asof_forward_broadcast_matches_duckdb(spark, facts, dims):
    """The banded-broadcast strategy's forward direction agrees with
    DuckDB's forward ASOF on random inputs (exact ties, facts after
    the last dim row, facts before the first)."""
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(facts)], "idx long, ft long"
    )
    right = spark.createDataFrame(
        [(t,) for t in sorted(set(dims))], "dt long"
    )
    out = asof_join(
        left, right, "ft", "dt", strategy="broadcast", direction="forward"
    )
    got = {r.idx: r.dt for r in out.collect()}
    assert got == _oracle_forward(facts, dims)


def _oracle_nearest(facts: list[int], dims: list[int]) -> dict[int, int | None]:
    """Min |dist|, tie -> earlier dim (the floor-midpoint rule)."""
    ds = sorted(set(dims))
    out: dict[int, int | None] = {}
    for i, ft in enumerate(facts):
        out[i] = min(ds, key=lambda d: (abs(ft - d), d)) if ds else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(TS, min_size=1, max_size=40),
    dims=st.lists(TS, min_size=0, max_size=25),
)
def test_asof_nearest_matches_bruteforce(spark, facts, dims):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(facts)], "idx long, ft long"
    )
    right = spark.createDataFrame(
        [(t,) for t in sorted(set(dims))], "dt long"
    )
    out = asof_join(left, right, "ft", "dt", strategy="broadcast",
                    direction="nearest")
    got = {r.idx: r.dt for r in out.collect()}
    assert got == _oracle_nearest(facts, dims)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(TS, min_size=1, max_size=40),
    dims=st.lists(TS, min_size=1, max_size=25),
)
def test_asof_nearest_duplicate_right_ts(spark, facts, dims):
    """Duplicate right timestamps with DIFFERING payloads collapse to
    one deterministic winner (min payload struct): every fact near a
    duplicated ts must see the same payload copy, and matches must
    still be the nearest ts with ties broken earlier."""
    # every dim ts appears twice, with payloads 2t and 2t+1 — the
    # min-struct winner is always payload 2t
    rows = [(t, 2 * t) for t in dims] + [(t, 2 * t + 1) for t in dims]
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(facts)], "idx long, ft long"
    )
    right = spark.createDataFrame(rows, "dt long, pay long")
    out = asof_join(left, right, "ft", "dt", strategy="broadcast",
                    direction="nearest")
    got_ts = {r.idx: r.dt for r in out.collect()}
    got_pay = {r.idx: r.pay for r in out.collect()}
    expect = _oracle_nearest(facts, dims)
    assert got_ts == expect
    assert got_pay == {i: (None if t is None else 2 * t)
                       for i, t in expect.items()}


def test_asof_nearest_union_strategy_rejected(spark):
    left = spark.createDataFrame([(1, 1)], "idx long, ft long")
    right = spark.createDataFrame([(1,)], "dt long")
    with pytest.raises(ValueError, match="nearest"):
        asof_join(left, right, "ft", "dt", strategy="union",
                  direction="nearest")
