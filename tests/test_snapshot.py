"""Snapshot log + time travel: replay correctness vs a pure-Python
reference, commit-protocol guards (duplicate add / bogus remove /
torn tmp entries), time-travel reads at every version, the
empty-snapshot schema contract, and the DuckDB summary oracle."""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from survivor_processing_spark.operators.snapshot import (
    commit_version,
    log_versions,
    read_snapshot,
    snapshot_files,
    snapshot_history,
    snapshot_summary,
    snapshot_summary_oracle,
)


def _write(d: str, name: str, keys: list[int]) -> str:
    pq.write_table(
        pa.table({"k": keys, "amt": [float(k) for k in keys]}),
        os.path.join(d, name),
    )
    return name


@pytest.fixture()
def table_dir():
    d = tempfile.mkdtemp()
    try:
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_commit_replay_roundtrip(table_dir):
    _write(table_dir, "a.parquet", [1, 2])
    _write(table_dir, "b.parquet", [3])
    _write(table_dir, "c.parquet", [4, 5, 6])
    assert commit_version(table_dir, adds=["a.parquet", "b.parquet"]) == 1
    assert commit_version(
        table_dir, adds=["c.parquet"], removes=["a.parquet"]
    ) == 2
    assert snapshot_files(table_dir, 1) == ["a.parquet", "b.parquet"]
    assert snapshot_files(table_dir, 2) == ["b.parquet", "c.parquet"]
    assert snapshot_files(table_dir) == ["b.parquet", "c.parquet"]  # head
    assert log_versions(table_dir) == [1, 2]


def test_commit_guards(table_dir):
    _write(table_dir, "a.parquet", [1])
    commit_version(table_dir, adds=["a.parquet"])
    with pytest.raises(ValueError, match="already-active"):
        commit_version(table_dir, adds=["a.parquet"])
    with pytest.raises(ValueError, match="non-active"):
        commit_version(table_dir, removes=["nope.parquet"])
    with pytest.raises(ValueError, match="empty commit"):
        commit_version(table_dir)
    with pytest.raises(ValueError, match="not in log"):
        snapshot_files(table_dir, 99)
    with pytest.raises(ValueError, match="no snapshot log"):
        snapshot_files(tempfile.mkdtemp(), 1)


def test_torn_tmp_entry_ignored(table_dir):
    _write(table_dir, "a.parquet", [1])
    commit_version(table_dir, adds=["a.parquet"])
    # a crashed writer leaves a .tmp — replay must not see it
    with open(
        os.path.join(table_dir, "_sps_log", "v00000002.json.tmp"), "w"
    ) as f:
        f.write("{ torn")
    assert log_versions(table_dir) == [1]
    assert snapshot_files(table_dir) == ["a.parquet"]


def test_time_travel_reads(spark, table_dir):
    _write(table_dir, "a.parquet", [1, 2])
    _write(table_dir, "b.parquet", [3])
    _write(table_dir, "b2.parquet", [30, 31])
    commit_version(table_dir, adds=["a.parquet", "b.parquet"])
    # "compaction" commit: b replaced by b2 in one atomic version
    commit_version(table_dir, adds=["b2.parquet"], removes=["b.parquet"])
    v1 = sorted(r["k"] for r in read_snapshot(spark, table_dir, 1).collect())
    v2 = sorted(r["k"] for r in read_snapshot(spark, table_dir, 2).collect())
    assert v1 == [1, 2, 3]
    assert v2 == [1, 2, 30, 31]
    # the scan schedules EXACTLY the snapshot's files
    got = sorted(
        os.path.basename(f)
        for f in read_snapshot(spark, table_dir, 1).inputFiles()
    )
    assert got == ["a.parquet", "b.parquet"]


def test_empty_snapshot_keeps_schema(spark, table_dir):
    _write(table_dir, "a.parquet", [1, 2])
    commit_version(table_dir, adds=["a.parquet"])
    commit_version(table_dir, removes=["a.parquet"])
    df = read_snapshot(spark, table_dir, 2)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "amt"]


def test_history_shape(spark, table_dir):
    _write(table_dir, "a.parquet", [1])
    _write(table_dir, "b.parquet", [2])
    commit_version(table_dir, adds=["a.parquet", "b.parquet"])
    commit_version(table_dir, removes=["a.parquet"])
    rows = [tuple(r) for r in snapshot_history(spark, table_dir).collect()]
    assert rows == [(1, 2, 0, 2), (2, 0, 1, 1)]


def test_summary_matches_duckdb_oracle(spark, table_dir):
    _write(table_dir, "a.parquet", [1, 2])
    _write(table_dir, "b.parquet", [3])
    _write(table_dir, "c.parquet", [4, 5])
    commit_version(table_dir, adds=["a.parquet", "b.parquet"])
    commit_version(table_dir, adds=["c.parquet"], removes=["a.parquet"])
    commit_version(table_dir, removes=["b.parquet", "c.parquet"])
    versions = [1, 2, 3]
    got = sorted(
        tuple(r)
        for r in snapshot_summary(
            spark, table_dir, versions, "amt"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(snapshot_summary_oracle(table_dir, versions, "amt"))
        .fetchall()
    )
    assert got == want
    assert got[2] == (3, 0, 0.0)  # the emptied snapshot
