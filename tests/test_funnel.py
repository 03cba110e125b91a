"""Funnel conversion: hand-checkable reach counts, out-of-order
events never convert, same-timestamp progression (>=) does,
cross-engine equality (Spark == generated DuckDB oracle) on fixed
and randomized event logs, empty-step behavior, and validation."""

from __future__ import annotations

import random

import duckdb
import pytest

from survivor_processing_spark.operators.funnel import (
    funnel_steps,
    funnel_oracle,
)

SCHEMA = "user_id long, ts long, event_type string"
STEPS = [
    ("view", "event_type = 'view'"),
    ("click", "event_type = 'click'"),
    ("buy", "event_type = 'buy'"),
]


def _spark_rows(spark, rows, steps=STEPS):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        map(tuple, funnel_steps(df, "user_id", "ts", steps).collect())
    )


def _duck_rows(rows, steps=STEPS):
    con = duckdb.connect()
    values = ", ".join(f"({u}, {t}, '{e}')" for u, t, e in rows)
    src = (
        f"SELECT * FROM (VALUES {values}) AS t(user_id, ts, event_type)"
    )
    return sorted(
        map(
            tuple,
            con.execute(
                funnel_oracle("user_id", "ts", steps, src)
            ).fetchall(),
        )
    )


def test_hand_checkable(spark):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),  # full funnel
        (2, 10, "view"), (2, 20, "click"),                   # stops at 2
        (3, 10, "click"), (3, 20, "view"),                   # wrong order
        (4, 50, "buy"),                                      # no entry
    ]
    got = _spark_rows(spark, rows)
    assert got == [(1, "view", 3), (2, "click", 2), (3, "buy", 1)]
    assert got == _duck_rows(rows)


def test_same_timestamp_progresses(spark):
    rows = [(1, 10, "view"), (1, 10, "click"), (1, 10, "buy")]
    got = _spark_rows(spark, rows)
    assert got == [(1, "view", 1), (2, "click", 1), (3, "buy", 1)]
    assert got == _duck_rows(rows)


def test_earliest_reach_governs(spark):
    # user clicks before AND after the first view: the later click
    # counts, anchored at the earliest view
    rows = [(1, 5, "click"), (1, 10, "view"), (1, 15, "click")]
    got = _spark_rows(spark, rows)
    assert got == [(1, "view", 1), (2, "click", 1), (3, "buy", 0)]
    assert got == _duck_rows(rows)


def test_empty_funnel_rows_present(spark):
    rows = [(1, 1, "other")]
    got = _spark_rows(spark, rows)
    assert got == [(1, "view", 0), (2, "click", 0), (3, "buy", 0)]
    assert got == _duck_rows(rows)


def test_validation(spark):
    with pytest.raises(ValueError):
        funnel_steps(None, "u", "ts", [])


def test_randomized_cross_engine(spark):
    rng = random.Random(20260815)
    types = ["view", "click", "buy", "other"]
    for trial in range(4):
        rows = [
            (
                rng.randrange(1, 8),
                rng.randrange(0, 40),
                rng.choice(types),
            )
            for _ in range(rng.randrange(1, 80))
        ]
        assert _spark_rows(spark, rows) == _duck_rows(rows), (trial, rows)
