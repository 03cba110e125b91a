"""As-of join semantics (FIXTURES.md §C.3): exact-tie matches,
before-first → NULL, after-last matches last — for BOTH physical
strategies, which must agree everywhere."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from survivor_processing_spark.operators.asof import asof_join, containment_join


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_pair(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00")),  # exact tie with right r2
            (2, ts("2024-01-01 09:00:00")),  # before first right → NULL
            (3, ts("2024-01-01 23:00:00")),  # after last right → r3
            (4, ts("2024-01-01 10:30:00")),  # between r2 and r3 → r2
        ],
        "id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, ts("2024-01-01 09:30:00")),
            (102, ts("2024-01-01 10:00:00")),
            (103, ts("2024-01-01 12:00:00")),
        ],
        "event_id int, event_ts timestamp",
    )
    return left, right

EXPECTED = {1: 102, 2: None, 3: 103, 4: 102}


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_backward_semantics(asof_pair, strategy):
    left, right = asof_pair
    out = asof_join(left, right, "ts", "event_ts", strategy=strategy,
                    allow_unkeyed_union=True)
    got = {r["id"]: r["event_id"] for r in out.collect()}
    assert got == EXPECTED


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_keyed(spark, strategy):
    left = spark.createDataFrame(
        [(1, "a", ts("2024-01-01 10:00:00")), (2, "b", ts("2024-01-01 10:00:00"))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(201, "a", ts("2024-01-01 09:00:00")), (202, "b", ts("2024-01-01 11:00:00"))],
        "event_id int, k string, event_ts timestamp",
    )
    out = asof_join(left, right, "ts", "event_ts", by=["k"], strategy=strategy)
    got = {r["id"]: r["event_id"] for r in out.collect()}
    assert got == {1: 201, 2: None}  # key b's only event is in the future


def test_asof_left_rows_preserved(asof_pair):
    left, right = asof_pair
    for strategy in ("broadcast", "union"):
        assert asof_join(left, right, "ts", "event_ts", strategy=strategy,
                         allow_unkeyed_union=True).count() == 4


def test_containment_nullout(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-05 00:00:00")), (2, ts("2024-02-05 00:00:00"))],
        "k int, point timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00"), "in-jan"),
         (2, ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00"), "in-jan")],
        "k int, s timestamp, e timestamp, payload string",
    )
    out = containment_join(
        left, right, keys=["k"], point="point", start="s", end="e",
        null_out_cols=["payload"],
    )
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {1: "in-jan", 2: None}  # row kept, payload NULLed


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_forward_semantics(asof_pair, strategy):
    """Forward: nearest right at ts >= left ts, both strategies."""
    left, right = asof_pair
    out = asof_join(left, right, "ts", "event_ts", strategy=strategy,
                    direction="forward", allow_unkeyed_union=True)
    got = {r["id"]: r["event_id"] for r in out.collect()}
    # 1: exact tie -> 102; 2: 09:00 -> first right 101;
    # 3: 23:00 after last -> None; 4: 10:30 -> 103
    assert got == {1: 102, 2: 101, 3: None, 4: 103}


def test_asof_unkeyed_union_reroutes_to_broadcast(asof_pair):
    """by=[] + strategy='union' must NOT build a global-sort plan:
    it reroutes (with a warning) to the banded-broadcast strategy."""
    import warnings

    left, right = asof_pair
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = asof_join(left, right, "ts", "event_ts", strategy="union")
        assert any("single global-sort" in str(x.message) for x in w)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # banded-broadcast shape: BHJ probes; the only nested-loop allowed
    # is the single-row open-interval join (build side = one row)
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    got = {r["id"]: r["event_id"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_union_null_payload_no_row_mixing(spark):
    """A right row whose payload column is legitimately NULL must NOT
    have that column backfilled from an older right row (struct-pack
    fill: all right columns come from the same matched row)."""
    left = spark.createDataFrame(
        [(1, "k", 20), (2, "k", 40)], "id int, k string, t long"
    )
    right = spark.createDataFrame(
        [("k", 10, "old-payload"), ("k", 30, None)],
        "k string, rt long, payload string",
    )
    out = asof_join(left, right, "t", "rt", by=["k"], strategy="union")
    got = {r["id"]: (r["rt"], r["payload"]) for r in out.collect()}
    # id=2 matches the rt=30 row whose payload is NULL — it must stay
    # NULL, not leak "old-payload" from rt=10
    assert got == {1: (10, "old-payload"), 2: (30, None)}
