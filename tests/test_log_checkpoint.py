"""Snapshot-log CHECKPOINTS (r11, operators/snapshot.py
``checkpoint_snapshot``): the Delta ``_last_checkpoint`` move without
history loss — full replayed state (active set, per-file stats,
deletion-vector coverage, evolved schema) at one version, so every
reader seeds its replay from the newest checkpoint ≤ its target and
pays O(commits since checkpoint).  Time travel below a checkpoint
must ignore it; expiry must reclaim checkpoints whose forward deltas
died; a checkpointed table must answer every question byte-identically
to the checkpoint-free replay."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from survivor_processing_spark.operators.mor import (
    delete_from_snapshot_mor,
)
from survivor_processing_spark.operators.snapshot import (
    _ckpt_path,
    checkpoint_snapshot,
    commit_version,
    expire_snapshots,
    file_stats,
    log_checkpoints,
    read_snapshot,
    snapshot_dvs,
    snapshot_files,
    table_schema,
)


def _write(d: str, name: str, keys: list[int]) -> str:
    pq.write_table(
        pa.table({"k": pa.array(keys, type=pa.int64())}),
        os.path.join(d, name),
    )
    return name


@pytest.fixture()
def tbl():
    d = tempfile.mkdtemp(prefix="sps_ckpt_")
    for i in range(4):
        _write(d, f"f{i}.parquet", list(range(i * 10, i * 10 + 10)))
    commit_version(
        d,
        adds=["f0.parquet", "f1.parquet"],
        stats={
            "f0.parquet": {
                "k": {"n_rows": 10, "vmin": "0", "vmax": "9",
                      "ord": "numeric"}
            }
        },
    )
    commit_version(d, adds=["f2.parquet"], removes=["f0.parquet"])
    commit_version(
        d, adds=["f3.parquet"], schema=[["k", "bigint"]]
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _full_state(d, v=None):
    return (
        snapshot_files(d, v),
        file_stats(d, v),
        snapshot_dvs(d, v),
        table_schema(d, v),
    )


def test_checkpoint_state_equals_full_replay(tbl):
    before = {v: _full_state(tbl, v) for v in (1, 2, 3)}
    out = checkpoint_snapshot(tbl)
    assert out["version"] == 3 and out["n_active"] == 3
    assert log_checkpoints(tbl) == [3]
    # every version answers identically with the checkpoint present
    for v in (1, 2, 3):
        assert _full_state(tbl, v) == before[v], v
    assert _full_state(tbl, None) == before[3]


def test_checkpoint_seeds_later_replay(tbl):
    checkpoint_snapshot(tbl)
    _write(tbl, "f4.parquet", list(range(40, 50)))
    commit_version(
        tbl,
        adds=["f4.parquet"],
        removes=["f1.parquet"],
        stats={
            "f4.parquet": {
                "k": {"n_rows": 10, "vmin": "40", "vmax": "49",
                      "ord": "numeric"}
            }
        },
    )
    assert snapshot_files(tbl) == [
        "f2.parquet", "f3.parquet", "f4.parquet"
    ]
    st = file_stats(tbl)
    assert st["f4.parquet"]["k"]["vmax"] == "49"
    assert st["f2.parquet"] == {}  # added without stats, pre-ckpt
    assert table_schema(tbl) == [["k", "bigint"]]
    # time travel below the checkpoint still exact
    assert snapshot_files(tbl, 1) == ["f0.parquet", "f1.parquet"]
    assert file_stats(tbl, 1)["f0.parquet"]["k"]["vmin"] == "0"


def test_checkpoint_carries_dv_coverage(spark, tbl):
    out = delete_from_snapshot_mor(spark, tbl, "k", 12, 14)
    assert out["version"] == 4
    dvs_before = snapshot_dvs(tbl)
    rows_before = sorted(
        r["k"] for r in read_snapshot(spark, tbl).collect()
    )
    checkpoint_snapshot(tbl)
    assert snapshot_dvs(tbl) == dvs_before
    assert (
        sorted(r["k"] for r in read_snapshot(spark, tbl).collect())
        == rows_before
    )
    # a post-checkpoint rewrite still retires the checkpointed DV
    _write(tbl, "rw.parquet", [12, 13, 14, 15, 16, 17, 18, 19, 10, 11])
    commit_version(
        tbl, adds=["rw.parquet"], removes=["f1.parquet"],
        planned_version=4,
    )
    assert snapshot_dvs(tbl) == {}


def test_torn_checkpoint_falls_back_to_full_replay(tbl):
    want = _full_state(tbl)
    checkpoint_snapshot(tbl)
    with open(_ckpt_path(tbl, 3), "w") as f:
        f.write("{not json")
    assert _full_state(tbl) == want


def test_checkpoint_wrong_version_field_skipped(tbl):
    want = _full_state(tbl)
    checkpoint_snapshot(tbl)
    with open(_ckpt_path(tbl, 3)) as f:
        ck = json.load(f)
    ck["version"] = 99
    with open(_ckpt_path(tbl, 3), "w") as f:
        json.dump(ck, f)
    assert _full_state(tbl) == want


def test_expire_reclaims_stale_checkpoints_and_writes_head(tbl):
    checkpoint_snapshot(tbl)  # at v3
    for i in range(5):
        _write(tbl, f"g{i}.parquet", [100 + i])
        commit_version(tbl, adds=[f"g{i}.parquet"])
    checkpoint_snapshot(tbl)  # at v8
    want = _full_state(tbl)
    out = expire_snapshots(tbl, keep_last=3)
    assert out["cut_version"] == 6
    # the v3 checkpoint's delta entries died with expiry: reclaimed;
    # expiry leaves a fresh checkpoint at the surviving head
    assert log_checkpoints(tbl) == [8]
    assert _full_state(tbl) == want
    # and the remaining history still replays exactly
    assert snapshot_files(tbl, 6) == sorted(
        ["f1.parquet", "f2.parquet", "f3.parquet", "g0.parquet",
         "g1.parquet", "g2.parquet"]
    )


def test_checkpoint_idempotent(tbl):
    a = checkpoint_snapshot(tbl)
    with open(_ckpt_path(tbl, 3)) as f:
        payload_a = f.read()
    b = checkpoint_snapshot(tbl)
    with open(_ckpt_path(tbl, 3)) as f:
        payload_b = f.read()
    assert a == b and payload_a == payload_b


def test_table_changes_seeds_from_checkpoint(spark, tbl):
    """An incremental CDF read over a post-checkpoint window must
    apply the checkpointed DV coverage (pre-window deletes stay
    dead in delete images) and agree exactly with the
    checkpoint-free feed."""
    from survivor_processing_spark.operators.mor import table_changes

    delete_from_snapshot_mor(spark, tbl, "k", 12, 14)  # v4 DV on f1
    checkpoint_snapshot(tbl)  # at v4
    delete_from_snapshot_mor(spark, tbl, "k", 15, 16)  # v5
    want = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in table_changes(spark, tbl, 4, 5).collect()
    )
    # only the still-live rows of the second delete emit
    assert want == [(15, "delete", 5), (16, "delete", 5)]
    # remove the checkpoint: the feed must be identical without it
    os.remove(_ckpt_path(tbl, 4))
    bare = sorted(
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in table_changes(spark, tbl, 4, 5).collect()
    )
    assert bare == want


# --- ADVICE r11: one log listing per replay-style read ----------------------


def test_replay_readers_list_log_exactly_once(tbl, monkeypatch):
    """ADVICE r11 (medium): snapshot_dvs / file_stats / table_schema
    used to list the log BEFORE _replay re-listed it internally — a
    commit landing between the two listings made the delta loop
    iterate a stale list while _replay resolved the newer head, so a
    head read could silently miss the newest entry's dv_adds / stats
    / schema.  The fix drives both from _replay's single listing;
    this pins it structurally (exactly one listing per read)."""
    import survivor_processing_spark.operators.snapshot as snap

    calls: list[str] = []
    real = snap.log_versions

    def counting(d):
        calls.append(d)
        return real(d)

    monkeypatch.setattr(snap, "log_versions", counting)
    for fn in (snapshot_files, file_stats, snapshot_dvs, table_schema):
        calls.clear()
        fn(tbl)  # head read — the racy case was version=None
        assert len(calls) == 1, fn.__name__


def test_head_read_state_matches_resolved_version(spark, tbl, monkeypatch):
    """The loop-listing ⊇ replay-listing invariant, behaviorally: a
    commit that lands between two consecutive head reads is either
    entirely invisible (old head) or entirely visible (new head) —
    never a mixed read that claims the new head with the old DV
    state (the pre-fix failure: MOR-deleted rows resurrecting)."""
    import survivor_processing_spark.operators.snapshot as snap

    delete_from_snapshot_mor(spark, tbl, "k", 12, 14)  # v4: adds a DV
    want_v4 = snapshot_dvs(tbl, 4)
    assert want_v4  # the DV is live at v4
    real = snap.log_versions
    # serve a STALE listing (pre-v4) for the first read, the full
    # log afterwards — simulating the commit landing mid-sequence
    served: list[list[int]] = [[1, 2, 3]]

    def racy(d):
        return served.pop(0) if served else real(d)

    monkeypatch.setattr(snap, "log_versions", racy)
    first = snapshot_dvs(tbl)  # one listing -> consistent v3 state
    second = snapshot_dvs(tbl)  # fresh listing -> consistent v4 state
    assert first == {} and second == want_v4


# --- ADVICE r11: checkpoint cache identity + isolation ----------------------


def test_ckpt_cache_invalidates_on_recreated_same_mtime_file(tbl):
    """ADVICE r11 (low): a table dir deleted and recreated at the
    same path can mint a new ckpt-v{N}.json at an identical path; on
    coarse-mtime filesystems a bare-mtime cache key would serve the
    OLD table's parsed state.  The key now pins (mtime_ns, size,
    inode), so a recreated file — even with a byte-identical mtime —
    is a cache miss."""
    checkpoint_snapshot(tbl)
    p = _ckpt_path(tbl, 3)
    st = os.stat(p)
    before = snapshot_files(tbl)  # primes the cache
    with open(p) as f:
        ck = json.load(f)
    ck["active"] = ["other.parquet"]
    tmp = p + ".new"
    with open(tmp, "w") as f:
        json.dump(ck, f)
    os.replace(tmp, p)  # new inode at the same path
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))  # identical mtime
    assert snapshot_files(tbl) == ["other.parquet"] != before


def test_ckpt_cache_state_is_isolated_from_caller_mutation(tbl):
    """The cache must hand out copies: file_stats copies only one
    level, so a caller mutating an inner per-column stat dict would
    otherwise poison the cached parsed state for every later read."""
    checkpoint_snapshot(tbl)
    _write(tbl, "f9.parquet", [90])
    commit_version(
        tbl,
        adds=["f9.parquet"],
        stats={
            "f9.parquet": {
                "k": {"n_rows": 1, "vmin": "90", "vmax": "90",
                      "ord": "numeric"}
            }
        },
    )
    checkpoint_snapshot(tbl)  # v4 checkpoint carries f9's stats
    first = file_stats(tbl)
    first["f9.parquet"]["k"]["vmax"] = "poisoned"
    assert file_stats(tbl)["f9.parquet"]["k"]["vmax"] == "90"
