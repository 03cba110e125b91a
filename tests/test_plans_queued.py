"""Physical-plan audits for the r7 queued (unit-gated) operators —
the same discipline tests/test_plans.py applies to registered
queries: the plan must be the one that survives 100× scale before
the operator earns a registry slot.

All hot paths must stay JVM-side (no Python eval nodes), nothing may
cartesian, the substring gram count must partial-aggregate map-side,
the BPE vocabulary join must broadcast, and the exact split's two
windows must share one strata exchange."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")


def test_substring_spans_mapside_combine_no_cartesian(spark):
    from survivor_processing_spark.operators.substring import (
        substring_dedup_spans,
    )

    plan = _plan(substring_dedup_spans(_docs(spark), n=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in PY_NODES:
        assert node not in plan
    # the gram count partial-aggregates before its exchange
    assert "partial_count" in plan


def test_substring_clean_stays_jvm_side(spark):
    from survivor_processing_spark.operators.substring import (
        substring_dedup_clean,
    )

    plan = _plan(substring_dedup_clean(_docs(spark), n=6))
    for node in PY_NODES:
        assert node not in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_vocab_join_is_broadcast(spark):
    from survivor_processing_spark.operators.bpe import bpe_encode_counts

    df = bpe_encode_counts(
        _docs(spark), [("t", "h"), ("th", "e")], text_col="text"
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    for node in PY_NODES:
        assert node not in plan
    # the corpus side is never sort-merge-joined against the vocab
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_pq_encode_no_python_no_cartesian(spark):
    from survivor_processing_spark.operators.pq import pq_train_encode

    df = pq_train_encode(_emb(spark), m=4, k=4, iters=1, dim=64)
    plan = _plan(df)
    for node in PY_NODES:
        assert node not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_topk_is_take_ordered(spark):
    from survivor_processing_spark.operators.pq import pq_adc_topk

    df = pq_adc_topk(
        _emb(spark), [0.1] * 64, topk=5, m=4, k=4, iters=1
    )
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort for a top-k
    for node in PY_NODES:
        assert node not in plan


def test_bfs_no_cartesian_no_python(spark):
    from survivor_processing_spark.operators.bfs import bfs_levels

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    plan = _plan(bfs_levels(edges, [0], n_iters=2))
    assert "CartesianProduct" not in plan
    for node in PY_NODES:
        assert node not in plan


def test_exact_split_windows_share_one_exchange(spark):
    from survivor_processing_spark.operators.curation import (
        stratified_exact_split,
    )

    df = stratified_exact_split(_docs(spark), ["lang"], "doc_id")
    plan = _plan(df)
    # rank and count windows both partition by the strata: one
    # exchange feeds both, nothing else shuffles
    assert plan.count("Exchange") == 1
    for node in PY_NODES:
        assert node not in plan
