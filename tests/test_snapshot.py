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
    # (version, ts, n_adds, n_removes, n_active) — ts is the commit
    # wall-clock (r11), monotone across the two commits
    assert [(r[0], *r[2:]) for r in rows] == [(1, 2, 0, 2), (2, 0, 1, 1)]
    assert rows[0][1] is not None and rows[0][1] <= rows[1][1]


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


# --- copy-on-write MERGE over the snapshot log ------------------------------


def _seed_table(spark, d, ranges):
    """One key-sorted file per range; commit v1 with all of them."""
    names = []
    for i, (lo, hi) in enumerate(ranges):
        nm = f"seed-{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": list(range(lo, hi)),
                    "amt": [float(x) for x in range(lo, hi)],
                }
            ),
            os.path.join(d, nm),
        )
        names.append(nm)
    commit_version(d, adds=names)
    return names


def test_merge_rewrites_only_intersecting_files(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    names = _seed_table(
        spark, table_dir, [(0, 100), (100, 200), (200, 300), (300, 400)]
    )
    # updates hit only [100, 200); inserts land beyond every envelope
    src = spark.createDataFrame(
        [(150, -1.0), (199, -2.0), (999, -3.0)], "k long, amt double"
    )
    out = merge_into_snapshot(spark, table_dir, src, "k")
    assert out["version"] == 2
    assert out["n_affected"] == 1  # only seed-1
    assert out["n_untouched"] == 3
    after = set(snapshot_files(table_dir))
    # copy-on-write minimality: the three untouched files survive
    # BY NAME; the affected one is gone
    assert {"seed-0.parquet", "seed-2.parquet", "seed-3.parquet"} <= after
    assert "seed-1.parquet" not in after
    # table semantics: full upsert
    rows = {
        r["k"]: r["amt"]
        for r in read_snapshot(spark, table_dir).collect()
    }
    assert len(rows) == 401  # 400 seeds + 1 insert
    assert rows[150] == -1.0 and rows[199] == -2.0 and rows[999] == -3.0
    assert rows[149] == 149.0  # unmatched row of the rewritten file
    assert rows[0] == 0.0 and rows[399] == 399.0
    # time travel still serves the PRE-merge table
    v1 = {
        r["k"]: r["amt"]
        for r in read_snapshot(spark, table_dir, 1).collect()
    }
    assert len(v1) == 400 and v1[150] == 150.0 and 999 not in v1


def test_merge_insert_only_touches_nothing(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50), (50, 100)])
    src = spark.createDataFrame([(5000, 1.0)], "k long, amt double")
    out = merge_into_snapshot(spark, table_dir, src, "k")
    assert out["n_affected"] == 0 and out["n_untouched"] == 2
    assert read_snapshot(spark, table_dir).count() == 101


def test_merge_is_idempotent(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50), (50, 100)])
    src = spark.createDataFrame(
        [(10, -1.0), (60, -2.0)], "k long, amt double"
    )
    merge_into_snapshot(spark, table_dir, src, "k")
    first = sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    )
    merge_into_snapshot(spark, table_dir, src, "k")
    second = sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    )
    assert first == second


def test_merge_guards(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50)])
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "k long, amt double"
    )
    with pytest.raises(ValueError, match="not key-unique"):
        merge_into_snapshot(spark, table_dir, dup, "k")
    ok = spark.createDataFrame([(1, 1.0)], "k long, amt double")
    with pytest.raises(ValueError, match="ordering mismatch"):
        merge_into_snapshot(spark, table_dir, ok, "k", cast="string")
    with pytest.raises(ValueError, match="unsupported merge key cast"):
        merge_into_snapshot(spark, table_dir, ok, "k", cast="binary")


# --- OPTIMIZE execution: compaction as an atomic snapshot commit -------------


def test_compact_snapshot_merges_small_keeps_large(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        compact_snapshot,
    )

    # 4 small files + 1 big one; target sized so the smalls bin
    # together while the big file anchors its own singleton bin
    for i in range(4):
        _write(table_dir, f"small-{i}.parquet", [i * 10 + j for j in range(3)])
    _write(table_dir, "big.parquet", list(range(1000, 1400)))
    commit_version(
        table_dir,
        adds=[f"small-{i}.parquet" for i in range(4)] + ["big.parquet"],
    )
    before = sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    )
    # target == the big file's size: it fills bin 0 alone, and the
    # smalls pack together into the next bin
    big_bytes = os.path.getsize(os.path.join(table_dir, "big.parquet"))
    out = compact_snapshot(spark, table_dir, target_bytes=big_bytes)
    assert out["version"] == 2
    assert out["n_rewritten"] == 4  # the four smalls
    after_files = snapshot_files(table_dir)
    assert "big.parquet" in after_files  # singleton bin kept BY NAME
    assert len(after_files) < 5
    after = sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    )
    assert after == before  # a layout move, never a data change
    # time travel still serves the fragmented layout
    assert len(snapshot_files(table_dir, 1)) == 5
    # maintenance is idempotent: an already-optimal table no-ops
    again = compact_snapshot(spark, table_dir, target_bytes=big_bytes)
    assert again["version"] is None and again["n_rewritten"] == 0
    assert snapshot_files(table_dir) == after_files


def test_merge_empty_batch_is_noop(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 10)])
    empty = spark.createDataFrame([], "k long, amt double")
    out = merge_into_snapshot(spark, table_dir, empty, "k")
    assert out["version"] is None and out["adds"] == []
    assert snapshot_files(table_dir) == ["seed-0.parquet"]


# --- round-9 ADVICE hardening: key/schema guards, rollback, vacuum ----------


def test_merge_rejects_null_keys(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 10)])
    src = spark.createDataFrame([(None, 1.0), (3, 2.0)], "k long, amt double")
    with pytest.raises(ValueError, match="NULL merge keys"):
        merge_into_snapshot(spark, table_dir, src, "k")
    # nothing was written and no version landed
    assert log_versions(table_dir) == [1]
    assert snapshot_files(table_dir) == ["seed-0.parquet"]


def test_merge_rejects_schema_drift(spark, table_dir):
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 10)])
    extra = spark.createDataFrame(
        [(500, 1.0, "x")], "k long, amt double, junk string"
    )
    # extra columns are REJECTED: a silent drop loses the caller's
    # data, a silent add drifts the table schema
    with pytest.raises(ValueError, match="columns the table lacks"):
        merge_into_snapshot(spark, table_dir, extra, "k")
    assert read_snapshot(spark, table_dir).columns == ["k", "amt"]
    retyped = spark.createDataFrame([(501, 1)], "k long, amt int")
    with pytest.raises(ValueError, match="drift"):
        merge_into_snapshot(spark, table_dir, retyped, "k")
    missing = spark.createDataFrame([(502,)], "k long")
    with pytest.raises(ValueError, match="missing table columns"):
        merge_into_snapshot(spark, table_dir, missing, "k")


def test_merge_failed_commit_rolls_back_files(spark, table_dir, monkeypatch):
    import survivor_processing_spark.operators.snapshot as snap
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50)])
    before = sorted(os.listdir(table_dir))

    def boom(*a, **k):
        raise RuntimeError("injected commit failure")

    monkeypatch.setattr(snap, "commit_version", boom)
    src = spark.createDataFrame([(10, -1.0)], "k long, amt double")
    with pytest.raises(RuntimeError, match="injected"):
        merge_into_snapshot(spark, table_dir, src, "k")
    # the renamed merge-* data files were removed again; the table
    # directory and the snapshot are exactly as before
    assert sorted(os.listdir(table_dir)) == before
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert rows[10] == 10.0


def test_merge_envelope_width_guard(spark, table_dir):
    """cast='int' against a bigint envelope beyond int32: the file's
    envelope is uncastable, so it must count as AFFECTED (update in
    place), never silently unaffected (duplicate insert)."""
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    big = 1 << 40
    _write(table_dir, "huge.parquet", [big + i for i in range(5)])
    commit_version(table_dir, adds=["huge.parquet"])
    src = spark.createDataFrame([(big, -1.0)], "k long, amt double")
    out = merge_into_snapshot(spark, table_dir, src, "k", cast="int")
    assert out["n_affected"] == 1
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert len(rows) == 5  # updated, NOT re-inserted
    assert rows[big] == -1.0


def test_vacuum_orphans_removes_only_uncommitted(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import vacuum_orphans

    _seed_table(spark, table_dir, [(0, 10), (10, 20)])
    # retire seed-1 (still referenced by v1 -> must survive vacuum)
    commit_version(table_dir, removes=["seed-1.parquet"])
    # strand an orphan, as a crash between rename and commit would
    _write(table_dir, "merge-dead-00000.parquet", [99])
    gone = vacuum_orphans(table_dir)
    assert gone == ["merge-dead-00000.parquet"]
    assert not os.path.exists(
        os.path.join(table_dir, "merge-dead-00000.parquet")
    )
    # time travel intact: v1 still reads the retired file
    assert read_snapshot(spark, table_dir, 1).count() == 20
    assert read_snapshot(spark, table_dir).count() == 10


# --- round-9: stats-in-commit-log (Delta/Iceberg stats-in-manifest) ---------


def test_commit_stats_replay_and_guard(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        file_stats,
        stats_for_files,
    )

    _write(table_dir, "a.parquet", [1, 2, 3])
    _write(table_dir, "b.parquet", [10, 20])
    st = stats_for_files(table_dir, ["a.parquet"], ["k"])
    assert st["a.parquet"]["k"]["vmin"] == "1"
    assert st["a.parquet"]["k"]["vmax"] == "3"
    assert st["a.parquet"]["k"]["ord"] == "numeric"
    # stats for a file the commit does not add are rejected
    with pytest.raises(ValueError, match="does not add"):
        commit_version(
            table_dir, adds=["b.parquet"], stats=st
        )
    commit_version(table_dir, adds=["a.parquet", "b.parquet"], stats=st)
    rec = file_stats(table_dir)
    assert rec["a.parquet"]["k"]["vmax"] == "3"
    assert rec["b.parquet"] == {}  # add without stats: envelope-less
    # removes drop the file's stats from the replay
    commit_version(table_dir, removes=["a.parquet"])
    assert "a.parquet" not in file_stats(table_dir)
    assert "a.parquet" in file_stats(table_dir, 1)  # time travel keeps it


def test_snapshot_zonemap_log_first_no_footer_reads(spark, table_dir):
    """Files with recorded stats are planned FROM THE LOG: the
    manifest matches the footer builder's rows exactly, and still
    works after the data file's footer is destroyed — the proof no
    footer read happens on the fast path."""
    from survivor_processing_spark.operators.snapshot import (
        snapshot_zonemap,
        stats_for_files,
    )
    from survivor_processing_spark.operators.zonemap import (
        build_zonemap,
        prune_files,
    )

    _write(table_dir, "s0.parquet", list(range(0, 50)))
    _write(table_dir, "s1.parquet", list(range(50, 100)))
    footer = sorted(
        map(tuple, build_zonemap(spark, table_dir, ["k"]).collect())
    )
    commit_version(
        table_dir,
        adds=["s0.parquet", "s1.parquet"],
        stats=stats_for_files(
            table_dir, ["s0.parquet", "s1.parquet"], ["k"]
        ),
    )
    zm = snapshot_zonemap(spark, table_dir, ["k"])
    assert sorted(map(tuple, zm.collect())) == footer
    assert prune_files(zm, "k", 0, 10) == ["s0.parquet"]
    # fast-path proof: truncate a data file's footer; the log-first
    # manifest still serves its envelope (a footer walk would raise)
    p = os.path.join(table_dir, "s1.parquet")
    with open(p, "r+b") as f:
        f.truncate(8)
    zm2 = snapshot_zonemap(spark, table_dir, ["k"])
    assert sorted(map(tuple, zm2.collect())) == footer
    with pytest.raises(Exception):
        build_zonemap(spark, table_dir, ["k"], files=["s1.parquet"]).collect()


def test_snapshot_zonemap_mixed_log_falls_back(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        snapshot_zonemap,
        stats_for_files,
    )
    from survivor_processing_spark.operators.zonemap import build_zonemap

    _write(table_dir, "old.parquet", [1, 2])  # pre-stats commit
    commit_version(table_dir, adds=["old.parquet"])
    _write(table_dir, "new.parquet", [100, 200])
    commit_version(
        table_dir,
        adds=["new.parquet"],
        stats=stats_for_files(table_dir, ["new.parquet"], ["k"]),
    )
    got = sorted(
        map(tuple, snapshot_zonemap(spark, table_dir, ["k"]).collect())
    )
    want = sorted(
        map(tuple, build_zonemap(spark, table_dir, ["k"]).collect())
    )
    assert got == want  # fallback keeps mixed logs exactly correct


def test_merge_records_stats_for_its_adds(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import file_stats
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50), (50, 100)])
    src = spark.createDataFrame([(10, -1.0)], "k long, amt double")
    out = merge_into_snapshot(spark, table_dir, src, "k")
    rec = file_stats(table_dir)
    for name in out["adds"]:
        assert rec[name]["k"]["ord"] == "numeric"
        assert int(rec[name]["k"]["vmin"]) >= 0
    # and a second merge (planned log-first over those stats) still
    # upserts correctly
    out2 = merge_into_snapshot(
        spark, table_dir, spark.createDataFrame(
            [(10, -2.0)], "k long, amt double"
        ), "k",
    )
    assert out2["n_affected"] >= 1
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert rows[10] == -2.0 and len(rows) == 100


def test_compact_snapshot_records_stats(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        compact_snapshot,
        file_stats,
    )

    for i in range(3):
        _write(table_dir, f"sm-{i}.parquet", [i * 10 + j for j in range(5)])
    commit_version(table_dir, adds=[f"sm-{i}.parquet" for i in range(3)])
    out = compact_snapshot(
        spark, table_dir, target_bytes=10**9, stats_cols=["k"]
    )
    assert out["n_rewritten"] == 3
    rec = file_stats(table_dir)
    (name,) = out["adds"]
    assert rec[name]["k"]["vmin"] == "0" and rec[name]["k"]["vmax"] == "24"


def test_pruned_snapshot_scan_time_travel_and_skipping(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        pruned_snapshot_scan,
        stats_for_files,
    )

    _write(table_dir, "lo.parquet", list(range(0, 100)))
    _write(table_dir, "hi.parquet", list(range(100, 200)))
    commit_version(
        table_dir,
        adds=["lo.parquet", "hi.parquet"],
        stats=stats_for_files(table_dir, ["lo.parquet", "hi.parquet"], ["k"]),
    )
    commit_version(table_dir, removes=["lo.parquet"])
    # head: lo-range rows are GONE even though the range targets them
    assert pruned_snapshot_scan(spark, table_dir, "k", 0, 50).count() == 0
    # v1 time travel: same predicate finds them, scheduling only lo
    df = pruned_snapshot_scan(spark, table_dir, "k", 0, 50, version=1)
    assert df.count() == 51
    assert all("lo.parquet" in f for f in df.inputFiles())


def test_merge_plans_log_first_without_touching_untouched_footers(
    spark, table_dir
):
    """End-to-end no-footer-read proof AT THE MERGE LEVEL: with key
    envelopes recorded in the log, a merge whose keys miss file B
    never opens B — not its footer, not its data — even when B's
    on-disk bytes are destroyed."""
    from survivor_processing_spark.operators.snapshot import (
        stats_for_files,
    )
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _write(table_dir, "a.parquet", list(range(0, 50)))
    _write(table_dir, "b.parquet", list(range(1000, 1050)))
    commit_version(
        table_dir,
        adds=["a.parquet", "b.parquet"],
        stats=stats_for_files(table_dir, ["a.parquet", "b.parquet"], ["k"]),
    )
    # destroy b's bytes: any footer read (or scan) of it would fail
    with open(os.path.join(table_dir, "b.parquet"), "r+b") as f:
        f.truncate(8)
    src = spark.createDataFrame([(10, -1.0)], "k long, amt double")
    out = merge_into_snapshot(spark, table_dir, src, "k")
    assert out["n_affected"] == 1 and out["n_untouched"] == 1
    assert "b.parquet" in snapshot_files(table_dir)  # survived BY NAME


# --- round-9: per-file key blooms in the manifest ---------------------------


def test_bloom_cuts_merge_on_unsorted_table(spark, table_dir):
    """The case min/max envelopes cannot help: keys INTERLEAVED
    across files, so every envelope spans the whole domain.  With
    recorded blooms, a merge touching keys from one file rewrites
    ONLY that file; envelope-only would rewrite both."""
    from survivor_processing_spark.operators.snapshot import (
        file_key_blooms,
        stats_for_files,
    )
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    # evens in one file, odds in the other: identical envelopes
    _write(table_dir, "even.parquet", list(range(0, 200, 2)))
    _write(table_dir, "odd.parquet", list(range(1, 200, 2)))
    stats = stats_for_files(
        table_dir, ["even.parquet", "odd.parquet"], ["k"]
    )
    for f, b in file_key_blooms(
        spark, table_dir, ["even.parquet", "odd.parquet"], "k"
    ).items():
        stats[f]["k"]["bloom"] = b
    commit_version(
        table_dir, adds=["even.parquet", "odd.parquet"], stats=stats
    )
    src = spark.createDataFrame(
        [(40, -1.0), (80, -2.0)], "k long, amt double"  # even keys only
    )
    out = merge_into_snapshot(spark, table_dir, src, "k")
    assert out["n_affected"] == 1  # bloom excluded odd.parquet
    assert "odd.parquet" in snapshot_files(table_dir)  # survived BY NAME
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert len(rows) == 200
    assert rows[40] == -1.0 and rows[80] == -2.0 and rows[41] == 41.0


def test_bloom_build_probe_agree_no_false_negatives(spark, table_dir):
    """Property: every key present in a file MUST hit its recorded
    bloom (no false negatives ever) — merges that update existing
    keys always mark the holding file affected, so repeated merges
    stay idempotent.  Runs the real merge path twice over
    bloom-recorded files."""
    import random

    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    rng = random.Random(99)
    keys = rng.sample(range(10**9), 300)
    _write(table_dir, "r0.parquet", sorted(keys[:150]))
    _write(table_dir, "r1.parquet", sorted(keys[150:]))
    commit_version(table_dir, adds=["r0.parquet", "r1.parquet"])
    # first merge records blooms for ITS new files
    upd1 = spark.createDataFrame(
        [(k, -1.0) for k in keys[:20]], "k long, amt double"
    )
    merge_into_snapshot(spark, table_dir, upd1, "k")
    # second merge updates keys now living in bloom-recorded files:
    # a false negative would INSERT a duplicate instead of updating
    upd2 = spark.createDataFrame(
        [(k, -2.0) for k in keys[:20]], "k long, amt double"
    )
    merge_into_snapshot(spark, table_dir, upd2, "k")
    rows = read_snapshot(spark, table_dir).collect()
    assert len(rows) == 300  # no duplicates ever minted
    vals = {r["k"]: r["amt"] for r in rows}
    assert all(vals[k] == -2.0 for k in keys[:20])


# --- round-9: retention + log compaction (expire_snapshots) -----------------


def test_expire_snapshots_retention_and_reclaim(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        expire_snapshots,
        file_stats,
        stats_for_files,
    )

    # v1: a+b (with stats for a), v2: +c -a, v3: +d, v4: -b
    for n, ks in [("a", [1, 2]), ("b", [3]), ("c", [4]), ("d", [5])]:
        _write(table_dir, f"{n}.parquet", ks)
    commit_version(
        table_dir,
        adds=["a.parquet", "b.parquet"],
        stats=stats_for_files(table_dir, ["a.parquet"], ["k"]),
    )
    commit_version(table_dir, adds=["c.parquet"], removes=["a.parquet"])
    commit_version(table_dir, adds=["d.parquet"])
    commit_version(table_dir, removes=["b.parquet"])
    before_head = sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    )
    out = expire_snapshots(table_dir, keep_last=2)
    assert out["cut_version"] == 3 and out["n_expired_versions"] == 2
    # a died before the cut -> reclaimed; b is active AT the cut
    # (removed only at v4, which is retained) -> must survive on disk
    assert out["deleted_files"] == ["a.parquet"]
    assert not os.path.exists(os.path.join(table_dir, "a.parquet"))
    assert os.path.exists(os.path.join(table_dir, "b.parquet"))
    # retained versions replay identically
    assert log_versions(table_dir) == [3, 4]
    assert snapshot_files(table_dir, 3) == [
        "b.parquet", "c.parquet", "d.parquet"
    ]
    assert sorted(
        map(tuple, read_snapshot(spark, table_dir).collect())
    ) == before_head
    # expired versions are gone loudly, not wrongly
    with pytest.raises(ValueError, match="not in log"):
        snapshot_files(table_dir, 1)
    # commits continue from the head as before
    _write(table_dir, "e.parquet", [9])
    assert commit_version(table_dir, adds=["e.parquet"]) == 5
    # carried stats: b had none, the baseline must not invent any
    assert file_stats(table_dir, 3)["b.parquet"] == {}


def test_expire_snapshots_carries_stats_and_blooms(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        expire_snapshots,
        file_stats,
    )
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 50), (50, 100)])
    src = spark.createDataFrame([(10, -1.0)], "k long, amt double")
    merge_into_snapshot(spark, table_dir, src, "k")  # v2, stats+bloom
    merge_into_snapshot(
        spark, table_dir,
        spark.createDataFrame([(60, -1.0)], "k long, amt double"), "k",
    )  # v3
    out = expire_snapshots(table_dir, keep_last=1)
    assert out["cut_version"] == 3
    rec = file_stats(table_dir)
    merged = [f for f in snapshot_files(table_dir) if f.startswith("merge-")]
    assert merged
    for f in merged:
        assert "bloom" in rec[f]["k"]  # blooms survived the expiry
    # and the next merge still plans + upserts correctly over the
    # baseline-carried manifest
    merge_into_snapshot(
        spark, table_dir,
        spark.createDataFrame([(10, -9.0)], "k long, amt double"), "k",
    )
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert rows[10] == -9.0 and len(rows) == 100


def test_expire_snapshots_noop_and_guard(table_dir):
    from survivor_processing_spark.operators.snapshot import (
        expire_snapshots,
    )

    _write(table_dir, "a.parquet", [1])
    commit_version(table_dir, adds=["a.parquet"])
    assert expire_snapshots(table_dir, keep_last=5)["cut_version"] is None
    with pytest.raises(ValueError, match=">= 1"):
        expire_snapshots(table_dir, keep_last=0)


def test_bloom_auto_sizing_scales_with_rows(spark, table_dir):
    """auto sizing: ~10 bits/key clamped to [2^13, 2^17], chosen per
    FILE from the just-measured stats; mixed sizes coexist because
    the probe reads m per row."""
    from survivor_processing_spark.operators.snapshot import file_stats
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _seed_table(spark, table_dir, [(0, 10)])
    # big insert-only batch -> one or more new files totalling 5000
    # rows; every new file's m respects the clamp and the 10 bits/key
    # floor for ITS row count
    src = spark.createDataFrame(
        [(1000 + i, float(i)) for i in range(5000)], "k long, amt double"
    )
    out = merge_into_snapshot(spark, table_dir, src, "k")
    rec = file_stats(table_dir)
    for f in out["adds"]:
        st = rec[f]["k"]
        m = st["bloom"]["m"]
        n = int(st["n_rows"])
        assert 1 << 13 <= m <= 1 << 17
        assert m >= min(1 << 17, 10 * n)  # >= 10 bits/key up to clamp
    # small update -> small file -> floor-clamped m
    out2 = merge_into_snapshot(
        spark, table_dir,
        spark.createDataFrame([(5, -1.0)], "k long, amt double"), "k",
    )
    rec2 = file_stats(table_dir)
    assert all(rec2[f]["k"]["bloom"]["m"] == 1 << 13 for f in out2["adds"])
    # correctness unchanged
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert rows[5] == -1.0 and len(rows) == 5010


def test_bloom_guards_reject_ragged_and_ignore_corrupt(spark, table_dir):
    from survivor_processing_spark.operators.snapshot import (
        file_key_blooms,
        file_stats,
        stats_for_files,
    )
    from survivor_processing_spark.sinks.merge import merge_into_snapshot

    _write(table_dir, "x.parquet", [1, 2, 3])
    with pytest.raises(ValueError, match="multiple of 64"):
        file_key_blooms(spark, table_dir, ["x.parquet"], "k", num_bits=100)
    # a corrupt (truncated) recorded bloom degrades that file to
    # envelope-only: the merge still finds and updates its keys
    stats = stats_for_files(table_dir, ["x.parquet"], ["k"])
    good = file_key_blooms(spark, table_dir, ["x.parquet"], "k")["x.parquet"]
    good["b64"] = good["b64"][: len(good["b64"]) // 2]  # torn payload
    stats["x.parquet"]["k"]["bloom"] = good
    commit_version(table_dir, adds=["x.parquet"], stats=stats)
    out = merge_into_snapshot(
        spark, table_dir,
        spark.createDataFrame([(2, -1.0)], "k long, amt double"), "k",
    )
    assert out["n_affected"] == 1
    rows = {r["k"]: r["amt"] for r in read_snapshot(spark, table_dir).collect()}
    assert rows[2] == -1.0 and len(rows) == 3
    # the rewrite re-recorded a HEALTHY bloom for its new file
    rec = file_stats(table_dir)
    for f in out["adds"]:
        b = rec[f]["k"]["bloom"]
        assert len(b["b64"]) > 0 and b["m"] % 64 == 0


def test_expire_crash_window_cannot_resurrect_removed_files(spark, table_dir):
    """Simulate the crash between the baseline rewrite and the
    expired-entry deletion: restore the expired entries NEXT TO the
    baseline and replay — a file the cut version removed must stay
    removed (the baseline's explicit removes defeat the union), and
    every retained version replays identically."""
    import json as _json

    from survivor_processing_spark.operators.snapshot import (
        _entry_path,
        expire_snapshots,
    )

    for n, ks in [("a", [1]), ("b", [2]), ("c", [3]), ("d", [4])]:
        _write(table_dir, f"{n}.parquet", ks)
    commit_version(table_dir, adds=["a.parquet", "b.parquet"])   # v1
    commit_version(table_dir, adds=["c.parquet"],
                   removes=["a.parquet"])                        # v2 (cut)
    commit_version(table_dir, adds=["d.parquet"])                # v3
    # stash the entries that expiry will delete
    stash = {
        v: open(_entry_path(table_dir, v)).read() for v in (1,)
    }
    out = expire_snapshots(table_dir, keep_last=2)
    assert out["cut_version"] == 2 and out["deleted_files"] == ["a.parquet"]
    want_v2 = snapshot_files(table_dir, 2)
    want_v3 = snapshot_files(table_dir, 3)
    assert "a.parquet" not in want_v2
    # baseline carries the explicit remove
    with open(_entry_path(table_dir, 2)) as f:
        base = _json.load(f)
    assert base["removes"] == ["a.parquet"] and base.get("baseline")
    # recreate the crash window: old v1 entry coexists with baseline
    for v, payload in stash.items():
        with open(_entry_path(table_dir, v), "w") as f:
            f.write(payload)
    assert snapshot_files(table_dir, 2) == want_v2   # no resurrection
    assert snapshot_files(table_dir, 3) == want_v3


def test_commit_conflict_two_writers_never_clobber(table_dir):
    """VERDICT r09 #4: interleaved commits produce v and v+1 — the
    O_EXCL claim turns a silent last-write-win into a retry."""
    import threading

    from survivor_processing_spark.operators.snapshot import file_stats

    _write(table_dir, "a.parquet", [1])
    _write(table_dir, "b.parquet", [2])
    _write(table_dir, "c.parquet", [3])
    commit_version(table_dir, adds=["a.parquet"])  # v1
    barrier = threading.Barrier(2)
    got: dict[str, int] = {}
    errs: list[BaseException] = []

    def writer(name: str) -> None:
        try:
            barrier.wait()
            got[name] = commit_version(table_dir, adds=[name])
        except BaseException as e:  # pragma: no cover - failure path
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(n,))
        for n in ("b.parquet", "c.parquet")
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert sorted(got.values()) == [2, 3]
    assert log_versions(table_dir) == [1, 2, 3]
    assert snapshot_files(table_dir) == ["a.parquet", "b.parquet", "c.parquet"]
    # both entries are intact (neither clobbered the other's payload)
    assert set(file_stats(table_dir)) == {
        "a.parquet", "b.parquet", "c.parquet"
    }


def test_commit_conflict_claim_is_exclusive(table_dir):
    """The claim primitive itself: a pre-existing version file makes
    the commit retry PAST it (never overwrite), and a semantic
    conflict discovered on re-validation raises."""
    import json as _json

    from survivor_processing_spark.operators.snapshot import _entry_path

    _write(table_dir, "a.parquet", [1])
    _write(table_dir, "b.parquet", [2])
    commit_version(table_dir, adds=["a.parquet"])  # v1
    # simulate another writer having claimed v2 with a valid entry
    foreign = {"version": 2, "adds": ["b.parquet"], "removes": []}
    with open(_entry_path(table_dir, 2), "w") as f:
        _json.dump(foreign, f)
    # our add of b.parquet now re-validates as already-active: raises
    with pytest.raises(ValueError, match="already-active"):
        commit_version(table_dir, adds=["b.parquet"])
    # a non-conflicting add lands at v3, leaving the foreign v2 intact
    _write(table_dir, "c.parquet", [3])
    assert commit_version(table_dir, adds=["c.parquet"]) == 3
    with open(_entry_path(table_dir, 2)) as f:
        assert _json.load(f) == foreign


def test_file_stats_reset_on_remove_and_readd(table_dir):
    """ADVICE r09 (medium): a name added-with-stats, removed, then
    re-added with different content and NO new stats must NOT inherit
    the dead add's envelope — stale stats would let a prune skip a
    file that matches."""
    from survivor_processing_spark.operators.snapshot import file_stats

    _write(table_dir, "a.parquet", [1, 2])
    st = {
        "a.parquet": {
            "k": {"n_rows": 2, "vmin": "1", "vmax": "2", "ord": "numeric"}
        }
    }
    commit_version(table_dir, adds=["a.parquet"], stats=st)      # v1
    commit_version(table_dir, removes=["a.parquet"])             # v2
    # same NAME, new content (9..10), re-added without stats
    _write(table_dir, "a.parquet", [9, 10])
    commit_version(table_dir, adds=["a.parquet"])                # v3
    assert file_stats(table_dir) == {"a.parquet": {}}  # envelope gone
    # time travel still sees the original stats at v1
    assert file_stats(table_dir, 1) == st


def test_vacuum_grace_window_spares_fresh_files(table_dir):
    from survivor_processing_spark.operators.snapshot import vacuum_orphans

    _write(table_dir, "a.parquet", [1])
    commit_version(table_dir, adds=["a.parquet"])
    _write(table_dir, "fresh_orphan.parquet", [9])  # mtime = now
    assert vacuum_orphans(table_dir, grace_seconds=3600.0) == []
    assert os.path.exists(os.path.join(table_dir, "fresh_orphan.parquet"))
    assert vacuum_orphans(table_dir) == ["fresh_orphan.parquet"]
