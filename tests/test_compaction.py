"""compaction_plan / compaction_summary: bin-boundary arithmetic,
oversized files, NULL-size quarantine, per-partition independence,
and plan determinism."""

from __future__ import annotations

import pytest

from survivor_processing_spark.operators.compaction import (
    compaction_plan,
    compaction_summary,
)


def _plan(spark, rows, target, part_cols=()):
    df = spark.createDataFrame(rows, "part string, fid long, sz long")
    return {
        (r["part"], r["fid"]): r["bin"]
        for r in compaction_plan(
            df, size_col="sz", id_col="fid", target_bytes=target,
            part_cols=part_cols,
        ).collect()
    }


def test_exact_boundary_cuts_new_bin(spark):
    # sizes 4,4,4 at target 4: cum_before = 0,4,8 -> bins 0,1,2
    rows = [("a", 1, 4), ("a", 2, 4), ("a", 3, 4)]
    assert _plan(spark, rows, 4) == {("a", 1): 0, ("a", 2): 1, ("a", 3): 2}


def test_small_files_pack_together(spark):
    # sizes 3,2,1 (already size-desc) at target 6:
    # cum_before = 0,3,5 -> all bin 0; next file would start bin 1
    rows = [("a", 1, 3), ("a", 2, 2), ("a", 3, 1), ("a", 4, 6)]
    # ordering is size DESC: 6,3,2,1 -> cum_before 0,6,9,11 -> bins 0,1,1,1
    assert _plan(spark, rows, 6) == {
        ("a", 4): 0,
        ("a", 1): 1,
        ("a", 2): 1,
        ("a", 3): 1,
    }


def test_oversized_file_anchors_its_own_bin(spark):
    # a 10-size file at target 4 occupies bins [0..2]'s worth; the
    # next file starts at cum_before=10 -> bin 2 boundary spanning is
    # the documented OPTIMIZE behavior (bin ids stay monotonic)
    rows = [("a", 1, 10), ("a", 2, 2), ("a", 3, 2)]
    plan = _plan(spark, rows, 4)
    assert plan[("a", 1)] == 0
    assert plan[("a", 2)] == 2  # cum_before 10 div 4
    assert plan[("a", 3)] == 3  # cum_before 12 div 4


def test_partitions_independent(spark):
    rows = [("a", 1, 4), ("b", 2, 4), ("a", 3, 4), ("b", 4, 4)]
    plan = _plan(spark, rows, 4, part_cols=("part",))
    assert plan == {
        ("a", 1): 0,
        ("a", 3): 1,
        ("b", 2): 0,
        ("b", 4): 1,
    }


def test_null_size_quarantined(spark):
    rows = [("a", 1, 4), ("a", 2, None), ("a", 3, 4)]
    plan = _plan(spark, rows, 4)
    assert set(plan) == {("a", 1), ("a", 3)}
    assert plan[("a", 1)] == 0 and plan[("a", 3)] == 1


def test_tie_breaks_by_id(spark):
    # equal sizes: id ASC fixes the order, so the plan is stable
    rows = [("a", i, 2) for i in (5, 1, 3)]
    plan = _plan(spark, rows, 4)
    assert plan == {("a", 1): 0, ("a", 3): 0, ("a", 5): 1}


def test_summary_rollup(spark):
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 2), ("a", 3, 6)],
        "part string, fid long, sz long",
    )
    plan = compaction_plan(
        df, size_col="sz", id_col="fid", target_bytes=6, part_cols=("part",)
    )
    out = {
        (r["part"], r["bin"]): (r["n_files"], r["total_bytes"], r["max_file_bytes"])
        for r in compaction_summary(plan, "sz", ("part",)).collect()
    }
    assert out == {("a", 0): (1, 6, 6), ("a", 1): (2, 5, 3)}


def test_bad_target_raises(spark):
    df = spark.createDataFrame([("a", 1, 3)], "part string, fid long, sz long")
    with pytest.raises(ValueError):
        compaction_plan(df, size_col="sz", id_col="fid", target_bytes=0)
