"""Property test: ``apply_changelog`` agrees with a sequential
replay model on random ordered I/U/D changelogs — covering multiple
changes per key, deletes of absent keys, delete-then-reinsert, and
keys untouched by the log."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from survivor_processing_spark.operators.cdc import apply_changelog

KEY = st.integers(min_value=0, max_value=8)
VAL = st.integers(min_value=0, max_value=100)


def _model(base: dict[int, int], log: list[tuple[int, str, int]]) -> dict[int, int]:
    """Sequential replay: ops applied in seq order, upserts win,
    deletes drop — the semantics MERGE-style sinks must reproduce."""
    state = dict(base)
    for k, op, v in log:  # log already seq-ordered
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base_vals=st.lists(st.tuples(KEY, VAL), min_size=0, max_size=8,
                       unique_by=lambda t: t[0]),
    log=st.lists(st.tuples(KEY, st.sampled_from(["I", "U", "D"]), VAL),
                 min_size=1, max_size=20),
)
def test_cdc_matches_sequential_replay(spark, base_vals, log):
    base = spark.createDataFrame(
        base_vals or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    changes = spark.createDataFrame(
        [(k, i, op, v) for i, (k, op, v) in enumerate(log)],
        "k int, seq int, op string, v int",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(
            base, changes, keys=["k"], seq_col="seq", op_col="op"
        ).collect()
    }
    want = _model(dict(base_vals), log)
    assert got == want
