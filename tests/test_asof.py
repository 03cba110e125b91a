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
    out = asof_join(left, right, "ts", "event_ts", strategy=strategy)
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
        assert asof_join(left, right, "ts", "event_ts", strategy=strategy).count() == 4


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
