"""Snapshot log + time-travel reads — the versioned-table layer a
lakehouse format (Delta/Iceberg transaction log) provides, built as
a minimal JSON commit log since those packages aren't installable
here.  Completes the table-format trio with the compaction planner
(operators/compaction.py — decides new file LAYOUTS) and the zone
maps (operators/zonemap.py — skips files by stats): the snapshot log
is WHICH FILES ARE THE TABLE at each version, so a compaction can be
committed as remove(small files)+add(compacted file) without
rewriting readers, and any historical version stays queryable.

Mechanics: ``<table>/_sps_log/v{N}.json`` entries hold
``{"version", "adds": [...], "removes": [...]}`` — plus, when the
writer provides them, per-added-file column envelopes under
``"stats"`` (the Delta/Iceberg stats-in-manifest move: the writer
records the envelope once at commit time and every later prune or
merge plans from the log with ZERO footer reads — at 100 TB,
reopening a million footers costs more than the scan being pruned).
File names are relative to the table directory.  A snapshot at version v = replay
of entries 1..v (adds ∪, removes ∖) — O(log size) driver work on a
file-count-bounded log, exactly the zonemap-manifest cost class.
Commits are two-phase (write tmp, ``os.replace`` — atomic on POSIX)
and strictly sequential; like Delta's optimistic protocol collapsed
to the single-writer case, which is what a driver-coordinated Spark
job is.  At 100 TB none of this changes: the log stays tiny (one
entry per commit), and the SCAN — the only distributed part —
schedules exactly the active files, the same pre-plan file pruning
the zone maps do, composable with them.

Correctness contract (tested + fuzzed): for every version v,
``read_snapshot(..., v)`` ≡ reading exactly the files a pure-Python
replay of the log says are active at v; a version that removed
everything reads as an EMPTY table with the original schema; asking
for a version the log doesn't have raises.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.localrel import local_rows_df

LOG_DIR = "_sps_log"

# internal row-identity tag columns shared by every merge-on-read
# path (strip_deleted_rows here, the DML writers in operators/mor.py)
# — one definition so the tag a writer records and the tag a reader
# anti-joins can never drift
MOR_FILE_TAG = "__sps_mor_file"
MOR_POS_TAG = "__sps_mor_pos"


class SnapshotConflictError(RuntimeError):
    """Raised when a commit cannot claim a version number — another
    writer keeps winning the claim race (or the semantic
    re-validation against the new head fails with its own error)."""


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, LOG_DIR)


def _entry_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_path(table_dir), f"v{version:08d}.json")


def log_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending.  Ignores foreign files."""
    d = _log_path(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def plan_head(table_dir: str) -> int:
    """The read-set declaration every DML/maintenance writer captures
    BEFORE reading any plan state (active files, stats, DVs): the
    current log head, or 0 for an empty log.  Passed to
    ``commit_version(planned_version=)`` — capturing before the state
    reads is conservative-safe: a commit landing between the capture
    and a read can only raise a false conflict, never slip past one."""
    return (log_versions(table_dir) or [0])[-1]


def _ckpt_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_path(table_dir), f"ckpt-v{version:08d}.json")


def log_checkpoints(table_dir: str) -> list[int]:
    """Versions with a committed checkpoint, ascending (see
    :func:`checkpoint_snapshot`)."""
    d = _log_path(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("ckpt-v") and f.endswith(".json"):
            try:
                out.append(int(f[6:-5]))
            except ValueError:
                continue
    return sorted(out)


# (path -> ((mtime_ns, size, inode), parsed state)): one plan
# touches the same checkpoint through _replay, file_stats,
# snapshot_dvs AND table_schema.  The key is the file's full stat
# identity, not bare mtime: a table directory deleted and recreated
# at the same path within one process can mint a new ckpt-v{N}.json
# at an identical path, and on coarse-mtime filesystems bare mtime
# would serve the OLD table's parsed state for the new one —
# mtime_ns + size + inode pins the exact file object.  Bounded
# because a process reads a handful of tables.
_CKPT_CACHE: dict[str, tuple[tuple[int, int, int], dict]] = {}


def _latest_ckpt(
    table_dir: str, v: int, versions: list[int]
) -> dict | None:
    """The newest checkpoint at a version ≤ ``v`` that is still in
    the log (a checkpoint whose version expired is skipped — its
    delta entries may be gone, so replaying forward from it could
    miss history; :func:`expire_snapshots` deletes those, this guard
    covers the crash window).  Returns the loaded state or None."""
    vset = set(versions)
    for c in reversed(log_checkpoints(table_dir)):
        if c <= v and c in vset:
            path = _ckpt_path(table_dir, c)
            try:
                st = os.stat(path)
                ident = (st.st_mtime_ns, st.st_size, st.st_ino)
                hit = _CKPT_CACHE.get(path)
                if hit and hit[0] == ident:
                    ck = hit[1]
                else:
                    with open(path) as f:
                        ck = json.load(f)
                    if len(_CKPT_CACHE) > 16:
                        _CKPT_CACHE.clear()
                    _CKPT_CACHE[path] = (ident, ck)
            except (OSError, json.JSONDecodeError):
                continue  # torn/foreign checkpoint: fall back
            if ck.get("version") == c:
                # READ-ONLY CONTRACT: the returned object IS the
                # cached parsed state — callers must copy anything
                # they mutate or hand out (a mutated inner dict would
                # poison the cache for every later read).  _replay /
                # snapshot_dvs / table_schema already build fresh
                # sets/lists from it; file_stats deep-copies the stat
                # dicts it returns.  A defensive deepcopy here would
                # cost O(files) per call — more than the json.load
                # the cache exists to avoid.
                return ck
    return None


def commit_version(
    table_dir: str,
    adds: list[str] | None = None,
    removes: list[str] | None = None,
    stats: dict | None = None,
    max_attempts: int = 10,
    schema: list[list[str]] | None = None,
    dv_adds: dict[str, list[str]] | None = None,
    data_change: bool = True,
    planned_version: int | None = None,
) -> int:
    """Append the next version to the log; returns its number.

    Two-phase: the entry is written to a unique tmp name and CLAIMED
    as ``v{N}.json`` via ``os.link`` — atomic, and it FAILS if the
    name exists — so readers never observe a torn entry and two
    writers can never silently last-write-win the same version (the
    first step of Delta/Iceberg optimistic concurrency).  On a lost
    claim the commit re-reads the log, RE-VALIDATES its adds/removes
    against the new head (a semantic conflict — our add now active,
    our remove now gone — raises ``ValueError`` exactly like a bad
    input), and retries with the next number; ``max_attempts``
    exhausted raises :class:`SnapshotConflictError`.
    ``adds``/``removes`` are table-relative file names.  A remove of
    a file the snapshot doesn't hold, or an add of one it already
    holds, is rejected — silently tolerating either corrupts every
    later replay.

    ``schema`` (optional) records the table schema AT this commit as
    ``[[name, spark-ddl-type], ...]`` — the Delta-style
    schema-in-the-log move that makes SCHEMA EVOLUTION work: when any
    replayed entry ≤ v carries a schema, :func:`read_snapshot` reads
    with that EXPLICIT schema (latest wins), so files written before
    a widening read their missing columns as NULL without a
    mergeSchema footer sweep, and time travel to a pre-evolution
    version still serves the narrow schema.

    ``stats`` (optional) embeds per-file column envelopes IN the
    commit entry — the Delta/Iceberg stats-in-manifest move: at
    100 TB a prune that must reopen a million parquet footers costs
    more than the scan it saves, so the writer (who just produced
    the file) records the envelope once and every later plan reads
    it from the log.  Shape: ``{file: {col: {"n_rows", "vmin",
    "vmax", "ord"}}}`` with the exact stringified values
    :func:`operators.zonemap.file_column_stats` emits (one envelope
    representation everywhere).  Keys must be a subset of ``adds`` —
    stats for a file this commit doesn't introduce are rejected.

    ``dv_adds`` (optional) attaches DELETION-VECTOR sidecars — the
    merge-on-read half of row-level DML (operators/mor.py; Delta DVs
    / Iceberg v2 position deletes are the public design): each entry
    maps a sidecar parquet name (schema ``file string, pos long``,
    0-based row positions) to the ACTIVE data files it covers.  A
    sidecar may only cover files that are already active and not
    removed by this commit (covering a same-commit add would make the
    change-feed image of that add ambiguous), its name must be fresh
    (never added as data or DV before — replay keys on names), and
    coverage must be non-empty.  Replay prunes a sidecar's coverage
    as its files are removed and drops it when none remain, so a
    rewrite (purge/zorder/compaction/merge) retires DVs by
    construction — see :func:`snapshot_dvs`.

    ``data_change=False`` marks a commit whose LOGICAL table content
    is identical to its parent (compaction, z-order, DV purge — the
    Delta ``dataChange=false`` move), so an incremental change-feed
    reader (operators/mor.py ``table_changes``) can skip it instead
    of emitting rewrite noise.

    ``planned_version`` (optional) is the READ-SET declaration — the
    log version whose state (active files AND deletion vectors) this
    commit's content was computed from.  With it, the commit performs
    transaction-level conflict detection against every intervening
    commit (``planned_version < n``), the second half of Delta-style
    optimistic concurrency on top of the O_EXCL version claim:

    - an intervening commit REMOVED a file this commit removes →
      :class:`SnapshotConflictError` (two writers rewrote the same
      file; replaying the loser would double-apply or resurrect);
    - an intervening commit attached a DELETION VECTOR covering a
      file this commit removes → :class:`SnapshotConflictError` (the
      rewrite was computed with the OLDER DV set, so committing it
      would resurrect the concurrently-deleted rows — sidecar-only
      commits never change the active set, which is exactly why the
      file-level re-validation alone cannot see them);
    - an intervening commit removed a file this commit's ``dv_adds``
      cover → :class:`SnapshotConflictError` (the tombstones name
      positions in a file a concurrent rewrite just retired; the
      re-validation would also reject this, but as a caller error —
      with a read-set it is correctly a concurrency conflict).

    The loser replans from the new head (all writers in
    operators/mor.py / sinks/merge.py / compaction surface this by
    raising; a retry re-reads the log and converges).  Without
    ``planned_version`` the historical file-level checks still run,
    but sidecar-only intervening commits are invisible to them."""
    adds = list(adds or [])
    removes = list(removes or [])
    dv_adds = {s: list(cov) for s, cov in (dv_adds or {}).items()}
    if not adds and not removes and not dv_adds:
        raise ValueError("empty commit")
    # FLAT names only: every layer that keys on a file (zone-map
    # manifests, bloom builds via input_file_name, vacuum's listdir)
    # identifies files by basename, so a path-shaped name would let
    # 'sub/x.parquet' silently vanish from pruned scans while reads
    # still resolve it.  One representation everywhere — reject,
    # don't guess.
    dv_names = list(dv_adds)
    dv_covered = [f for cov in dv_adds.values() for f in cov]
    shaped = [
        n
        for n in adds + removes + dv_names + dv_covered
        if "/" in n or "\\" in n
    ]
    if shaped:
        raise ValueError(
            f"file names must be flat (no path separators): {shaped}"
        )
    empty_cov = sorted(s for s, cov in dv_adds.items() if not cov)
    if empty_cov:
        raise ValueError(
            f"deletion-vector sidecars with empty coverage: {empty_cov}"
        )
    dv_clash = sorted(set(dv_names) & set(adds + removes))
    if dv_clash:
        raise ValueError(
            f"names are both data files and DV sidecars: {dv_clash}"
        )
    if stats:
        foreign = sorted(set(stats) - set(adds))
        if foreign:
            raise ValueError(
                f"stats for files this commit does not add: {foreign}"
            )
    import uuid

    own_removes = set(removes)
    own_covered = set(dv_covered)
    # incremental scan state: entries are immutable once committed,
    # so a lost-claim retry re-scans only versions appended since the
    # previous attempt instead of re-walking the whole log (the
    # conflict scan and the dv-name-freshness walk both reuse it)
    scanned_up_to = planned_version if planned_version is not None else 0
    used_names: set[str] = set()
    names_scanned_up_to = 0
    for _ in range(max_attempts):
        versions = log_versions(table_dir)
        if planned_version is not None:
            if versions and planned_version != 0 and (
                planned_version < versions[0]
            ):
                # history was COMPACTED under us (concurrent
                # expire_snapshots) — a maintenance race, not a
                # caller bug: the loser replans from the new head
                raise SnapshotConflictError(
                    f"planned_version {planned_version} expired from "
                    f"the log (head starts at v{versions[0]}) — a "
                    "concurrent expire compacted history; replan"
                )
            if planned_version != 0 and planned_version not in versions:
                raise ValueError(
                    f"planned_version {planned_version} not in log"
                )
            # read-set conflict scan: every commit that landed after
            # the version this commit's content was computed from
            for n in versions:
                if n <= scanned_up_to:
                    continue
                try:
                    with open(_entry_path(table_dir, n)) as f:
                        e = json.load(f)
                except FileNotFoundError:
                    # entry vanished between the listing and the
                    # read: concurrent expiry — same maintenance
                    # race as above
                    raise SnapshotConflictError(
                        f"log entry v{n} vanished mid-commit (a "
                        "concurrent expire compacted history); replan"
                    ) from None
                their_removes = set(e["removes"])
                their_covered = {
                    f
                    for cov in (e.get("dv_adds") or {}).values()
                    for f in cov
                }
                clash_rm = sorted(own_removes & their_removes)
                if clash_rm:
                    raise SnapshotConflictError(
                        f"conflict with v{n}: it removed files this "
                        f"commit (planned at v{planned_version}) also "
                        f"removes: {clash_rm} — replan from the head"
                    )
                clash_dv = sorted(own_removes & their_covered)
                if clash_dv:
                    raise SnapshotConflictError(
                        f"conflict with v{n}: it deletion-vectored "
                        f"rows in files this commit (planned at "
                        f"v{planned_version}) rewrites without those "
                        f"DVs: {clash_dv} — committing would "
                        "resurrect the deleted rows; replan"
                    )
                clash_cov = sorted(own_covered & their_removes)
                if clash_cov:
                    raise SnapshotConflictError(
                        f"conflict with v{n}: it removed files this "
                        f"commit's deletion vectors (planned at "
                        f"v{planned_version}) cover: {clash_cov} — "
                        "the tombstone positions are stale; replan"
                    )
                clash_cc = sorted(own_covered & their_covered)
                if clash_cc:
                    # DV-vs-DV on the same file (Delta's
                    # ConcurrentDeleteDelete shape): two writers
                    # tombstoned positions of one file from the same
                    # parent — a concurrent overlapping MOR
                    # delete/upsert.  For a delete the union would
                    # still read correctly (n_deleted would double-
                    # count), but for an UPSERT both writers append a
                    # replacement for the same key, so silent
                    # composition breaks key uniqueness — fail the
                    # loser; the retry replans against the first
                    # writer's tombstones
                    raise SnapshotConflictError(
                        f"conflict with v{n}: it attached deletion "
                        f"vectors over files this commit (planned at "
                        f"v{planned_version}) also tombstones: "
                        f"{clash_cc} — concurrent row-level writers "
                        "on the same file; replan"
                    )
                scanned_up_to = n
        active = set(snapshot_files(table_dir)) if versions else set()
        dup = [a for a in adds if a in active]
        if dup:
            raise ValueError(f"add of already-active files: {dup}")
        missing = [r for r in removes if r not in active]
        if missing:
            raise ValueError(f"remove of non-active files: {missing}")
        if dv_adds:
            bad_cov = sorted(set(dv_covered) - (active - set(removes)))
            if bad_cov:
                raise ValueError(
                    "DV coverage of files not active after this "
                    f"commit: {bad_cov}"
                )
            for n in versions:
                if n <= names_scanned_up_to:
                    continue
                try:
                    with open(_entry_path(table_dir, n)) as f:
                        e = json.load(f)
                except FileNotFoundError:
                    raise SnapshotConflictError(
                        f"log entry v{n} vanished mid-commit (a "
                        "concurrent expire compacted history); replan"
                    ) from None
                used_names |= set(e["adds"]) | set(e.get("dv_adds") or {})
                names_scanned_up_to = n
            stale = sorted(set(dv_names) & used_names)
            if stale:
                raise ValueError(
                    "DV sidecar names already used by the log "
                    f"(replay keys on names): {stale}"
                )
        v = (versions[-1] + 1) if versions else 1
        os.makedirs(_log_path(table_dir), exist_ok=True)
        import time as _time

        # commit wall-clock, clamped STRICTLY ABOVE the parent
        # entry's ts (parent + 1 ms — Delta's commit-timestamp
        # adjustment bumps the same way): raw wall clock from
        # whichever writer wins the claim can run backwards under
        # clock skew / an NTP step, and even a healthy clock lands
        # consecutive commits in the same ms-rounded instant — a TIE
        # would make 'latest version with ts <= query' resolve a
        # version's OWN commit time to its child (observed as a
        # flaky as-of read before the strict bump).  Strict
        # monotonicity also legalizes the early break in
        # version_at_timestamp.
        ts = round(_time.time(), 3)
        if versions:
            try:
                with open(_entry_path(table_dir, versions[-1])) as f:
                    parent_ts = json.load(f).get("ts")
            except (OSError, json.JSONDecodeError):
                parent_ts = None  # expired/torn parent: keep wall clock
            if parent_ts is not None:
                ts = round(max(ts, float(parent_ts) + 0.001), 3)
        entry = {
            "version": v,
            # the TIMESTAMP AS OF resolver keys on it
            # (version_at_timestamp); replay semantics never read it
            "ts": ts,
            "adds": sorted(adds),
            "removes": sorted(removes),
        }
        if stats:
            entry["stats"] = stats
        if schema:
            entry["schema"] = [list(c) for c in schema]
        if dv_adds:
            entry["dv_adds"] = {s: sorted(cov) for s, cov in dv_adds.items()}
        if not data_change:
            entry["data_change"] = False
        # unique tmp per attempt/writer: two racers must never clobber
        # each other's staged entry
        tmp = _entry_path(table_dir, v) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, _entry_path(table_dir, v))
            return v
        except FileExistsError:
            # another writer claimed v between our listing and our
            # link: loop — re-list, re-validate against the new head
            continue
        finally:
            os.remove(tmp)
    raise SnapshotConflictError(
        f"could not claim a version in {table_dir!r} after "
        f"{max_attempts} attempts (concurrent writers)"
    )


def _drop_empty_parts(table_dir: str, adds: list[str]) -> list[str]:
    """Delete 0-row staged parts and return the survivors — shared by
    every rewriter (compact/zorder/init/purge/COW delete).  A 0-row
    file is worse than noise in the manifest: its envelope is
    NULL-stat, and NULL-stat files are permanent 'never skip blind'
    candidates that every later merge/delete rewrites forever."""
    import pyarrow.parquet as _pq

    kept = []
    for name in adds:
        path = os.path.join(table_dir, name)
        if _pq.ParquetFile(path).metadata.num_rows == 0:
            os.remove(path)
        else:
            kept.append(name)
    return kept


def file_stats(
    table_dir: str, version: int | None = None
) -> dict[str, dict]:
    """Replayed per-file stats for the files ACTIVE at ``version``:
    ``{file: {col: {...}}}``.  A file whose add carried no stats maps
    to ``{}`` — present, but envelope-less (callers fall back to a
    footer read or treat it as unprunable; never skip blind).

    Stats are replayed PER ENTRY, exactly like the active set: an add
    resets the file's stats to whatever THAT commit recorded (or
    nothing), and a remove drops them — so a name that is added with
    stats, removed, and later re-added with different content can
    never inherit the dead add's envelope/bloom (a stale envelope
    would let a later prune or merge skip a file that matches)."""
    # single listing shared with _replay — see its docstring
    active, v, versions = _replay(table_dir, version)
    out: dict[str, dict] = {}
    start = 0
    ck = _latest_ckpt(table_dir, v, versions)
    if ck:
        # the checkpoint's stats map covers exactly its active set —
        # the same state this loop would have built up to there.
        # TWO-level copy (file dict AND per-column dicts): the
        # checkpoint cache hands out its parsed state by reference
        # (read-only contract), and this function's result escapes to
        # callers who may mutate the inner stat dicts.
        out = {
            f: {c: dict(s) for c, s in st.items()}
            for f, st in ck.get("stats", {}).items()
        }
        start = ck["version"]
    for n in versions:
        if n <= start:
            continue
        if n > v:
            break
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        for name in e["adds"]:
            out[name] = {}
        for name, st in (e.get("stats") or {}).items():
            out[name] = st
        for name in e["removes"]:
            out.pop(name, None)
    return {f: out.get(f, {}) for f in active}


def snapshot_zonemap_rows(
    table_dir: str,
    cols: list[str],
    version: int | None = None,
    recorded: dict[str, dict] | None = None,
) -> list[tuple]:
    """Driver-side rows of :func:`snapshot_zonemap` — ``(file, col,
    n_rows, vmin, vmax, ord)`` tuples.  Split out so callers that
    need a DRIVER-side look at the manifest (the writers' ordering
    guards — a string-equality check over a file-count-sized list)
    can read it without minting a Spark job; the manifest is
    file-count-sized driver data either way."""
    from .zonemap import file_column_stats

    # ``recorded`` lets a caller that already replayed the log (the
    # copy-on-write merge reads stats once for envelopes AND blooms)
    # skip a second replay of the same entries
    if recorded is None:
        recorded = file_stats(table_dir, version)
    rows = []
    for name in sorted(recorded):
        st = recorded[name]
        if all(c in st for c in cols):
            for c in cols:
                s = st[c]
                rows.append(
                    (
                        name,
                        c,
                        int(s["n_rows"]),
                        s["vmin"],
                        s["vmax"],
                        s["ord"],
                    )
                )
        else:
            # ONE metadata open decides column presence and the row
            # count; ONE stats walk covers every present column — not
            # an open per column (at the million-footer scale this
            # module budgets for, the multiplier is pure waste)
            path = os.path.join(table_dir, name)
            import pyarrow.parquet as _pq

            pf = _pq.ParquetFile(path)
            present = set(pf.schema_arrow.names)
            n = pf.metadata.num_rows
            want = [c for c in cols if c in present]
            if want:
                rows.extend(file_column_stats(path, want))
            for c in cols:
                if c not in present:
                    # pre-widening file: NULL-stat row — unprunable,
                    # never wrong
                    rows.append((name, c, int(n), None, None, None))
    return rows


def snapshot_zonemap(
    spark: SparkSession,
    table_dir: str,
    cols: list[str],
    version: int | None = None,
    recorded: dict[str, dict] | None = None,
) -> DataFrame:
    """Zone-map manifest for a snapshot, LOG-FIRST: files whose
    commit recorded stats for every requested column are served from
    the log (zero footer reads — the 100 TB fast path); the rest
    fall back to :func:`operators.zonemap.file_column_stats` footer
    walks, so mixed logs (pre-stats commits, foreign writers) stay
    exactly correct, just slower for those files.  Output schema is
    identical to ``build_zonemap`` and feeds the same
    ``prune_files``/``pruned_scan``.

    SCHEMA EVOLUTION interaction: a file written BEFORE a widening
    has no footer entry for the evolved column — its rows hold NULL
    there, which matches no range predicate and no join key, so the
    file gets a NULL-stat manifest row (unprunable-by-envelope,
    never skipped blind; the read side sees the NULLs).  Raising
    here instead would make every merge/delete on an evolved column
    crash against pre-widening files."""
    return local_rows_df(
        spark,
        snapshot_zonemap_rows(table_dir, cols, version, recorded),
        "file string, col string, n_rows long, "
        "vmin string, vmax string, ord string",
    )


def guard_zonemap_ordering(
    rows: list[tuple], key_col: str, cast: str, required: str, verb: str
) -> None:
    """Shared DRIVER-side ordering guard over zone-map rows: an
    envelope whose recorded comparison ordering disagrees with the
    cast's class raises (never a silent wrong prune).  A pure string
    equality over file-count-sized driver data — running it as a
    Spark filter+collect would bill a whole job for a list scan."""
    bad = next(
        (r for r in rows if r[5] is not None and r[5] != required), None
    )
    if bad is not None:
        raise ValueError(
            f"zone-map ordering mismatch on {key_col!r}: envelope "
            f"built {bad[5]}, {verb} cast {cast!r} "
            f"compares {required}"
        )


def _pack_words(words: list[int]) -> str:
    """Dense little-endian-free packing of int64 words → base64, the
    log-friendly form of a bloom filter's bit array."""
    import base64
    import struct

    return base64.b64encode(
        b"".join(struct.pack(">q", w) for w in words)
    ).decode("ascii")


def unpack_words(b64: str) -> list[int]:
    import base64
    import struct

    raw = base64.b64decode(b64)
    return [
        struct.unpack(">q", raw[i : i + 8])[0] for i in range(0, len(raw), 8)
    ]


def file_key_blooms(
    spark: SparkSession,
    table_dir: str,
    files: list[str] | dict[str, int],
    key_col: str,
    num_bits: int = 1 << 13,
    num_hashes: int = 3,
    key_type: str | None = None,
) -> dict[str, dict]:
    """Per-FILE Bloom filter over ``key_col``, in the
    ``commit_version(stats=...)`` bloom shape: ``{file: {"m", "k",
    "b64"}}`` — the manifest index that makes copy-on-write MERGE
    work on UNSORTED tables.  A min/max envelope over a file whose
    keys are scattered spans the whole key domain, so every file
    looks affected and the merge degrades to a full rewrite; a 1 KiB
    bloom per file (default 2^13 bits ≈ 800 keys at 10 bits/key —
    raise ``num_bits`` for bigger files; the log entry grows with
    the FILTER, not the data) excludes files that provably lack
    every source key.  False positives cost an extra rewrite, never
    correctness; false negatives cannot happen because the writer
    hashes the file's OWN full key column with the SAME
    Kirsch-Mitzenmacher family (operators/bloom.py ``_positions``)
    the probe uses — shared code, so the family can't drift.

    ONE distributed job for ALL files, even at mixed sizes: pass a
    ``{file: num_bits}`` dict to size each file's filter
    independently — the per-row m comes from a broadcast file→m map
    (the same per-row-m arithmetic the merge PROBE uses, so mixed
    sizes share one build exactly like they share one probe).  A
    list builds every file at the scalar ``num_bits``.  The job
    reads key_col of the new files, explodes the k probe positions,
    word-level ``bit_or`` grouped by (input file, word index).  NULL
    keys contribute no bits (a NULL in a file can never equal a
    source key — sources reject NULL keys outright)."""
    from .bloom import _positions, _powers

    if isinstance(files, dict):
        bits_by_file = dict(files)
        file_names = sorted(bits_by_file)
    else:
        file_names = list(files)
        bits_by_file = {f: num_bits for f in file_names}
    for f, m in bits_by_file.items():
        if m < 64 or m % 64:
            # the packed form is whole int64 words; a ragged tail word
            # would make a probe position index past the dense array
            # (NULL under legacy, an error under ANSI — either way not
            # a filter).  Reject at build time, never at probe time.
            raise ValueError(
                f"num_bits must be a positive multiple of 64, got {m}"
                f" (file {f!r})"
            )
    paths = [os.path.join(table_dir, f) for f in file_names]
    # explicit single-column read schema (r13 optimization): the
    # build only touches key_col, and its type is either handed in by
    # the writer (who just produced the files) or logged — footer
    # inference here cost ~0.1 s of driver work per commit for a
    # fact the caller already knows.  Unknown type falls back to
    # inference, never guesses; a table with no log yet (bootstrap
    # commit, direct builds over bare files) has nothing to consult.
    if key_type is None and log_versions(table_dir):
        logged = table_schema(table_dir)
        if logged:
            key_type = dict(logged).get(key_col)
    reader = (
        spark.read.schema(f"`{key_col}` {key_type}")
        if key_type
        else spark.read
    )
    sizes = set(bits_by_file.values())
    if len(sizes) == 1:
        m_expr = F.lit(next(iter(sizes)))
    else:
        # per-row filter size from a literal file→m map: one build
        # job for every size class (previously one job per class)
        m_expr = F.element_at(
            F.create_map(
                *[
                    c
                    for f in file_names
                    for c in (F.lit(f), F.lit(bits_by_file[f]))
                ]
            ),
            F.col("_f"),
        )
    # right-size the scan: the session's small-file split floor would
    # schedule 32 near-empty tasks for a KB-scale commit's files
    # (~15 ms each of pure task launch under foreachBatch's no-AQE
    # plans).  The build's cost is per ROW (explode k positions +
    # hash), not per byte — byte-based sizing single-tasked a
    # 150k-key build into a 5 s straggler — so size from the footer
    # row counts (driver-side metadata read, file-count-bounded) at
    # the ~64k rows/task spread_rows convention.  coalesce only ever
    # shrinks.
    import pyarrow.parquet as _pq

    total_rows = sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)
    want = max(1, (total_rows >> 16) + (1 if total_rows & 0xFFFF else 0))
    scan = reader.parquet(*paths)
    pos = (
        scan.coalesce(want)
        .select(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("_f"),
            F.col(key_col).alias("_k"),
        )
        .where(F.col("_k").isNotNull())
        .select(
            "_f",
            F.explode(
                F.array(*_positions(F.col("_k"), m_expr, num_hashes))
            ).alias("p"),
        )
    )
    rows = (
        pos.select(
            "_f",
            (F.col("p") / F.lit(64)).cast("int").alias("w"),
            F.element_at(
                _powers(),
                F.col("p").bitwiseAND(F.lit(63)).cast("int") + F.lit(1),
            ).alias("b"),
        )
        .groupBy("_f", "w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    sparse: dict[str, dict[int, int]] = {f: {} for f in file_names}
    for r in rows:
        sparse[r["_f"]][int(r["w"])] = int(r["word"])
    out = {}
    for f in file_names:
        n_words = bits_by_file[f] // 64
        dense = [sparse[f].get(w, 0) for w in range(n_words)]
        out[f] = {
            "m": bits_by_file[f],
            "k": num_hashes,
            "b64": _pack_words(dense),
        }
    return out


def attach_key_blooms(
    spark: SparkSession,
    table_dir: str,
    adds: list[str],
    key_col: str,
    new_stats: dict[str, dict],
    bloom_bits: int | str | None = "auto",
    key_type: str | None = None,
) -> dict[str, dict]:
    """Mutates ``new_stats`` in place: per-file key blooms for
    ``adds``, sized "auto" at ~10 bits/key from the row count the
    stats pass measured (clamped to [2^13, 2^17] bits — the log
    grows with the FILTER, not the data).  ONE distributed build job
    for every file regardless of size mix (``file_key_blooms`` takes
    the per-file sizing dict; previously each size class ran its own
    job — a mixed-size commit paid the whole job fixed cost twice).
    The single bloom-sizing policy for every writer (merge, delete,
    streaming bootstrap)."""
    if not bloom_bits or not adds:
        return new_stats
    bits: dict[str, int] = {}
    for fname in adds:
        if bloom_bits == "auto":
            n = int(new_stats[fname][key_col]["n_rows"])
            bits[fname] = min(
                1 << 17,
                max(1 << 13, 1 << (10 * max(n, 1)).bit_length()),
            )
        else:
            bits[fname] = int(bloom_bits)
    for fname, b in file_key_blooms(
        spark, table_dir, bits, key_col, key_type=key_type
    ).items():
        new_stats[fname][key_col]["bloom"] = b
    return new_stats


def pruned_snapshot_scan(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo,
    hi,
    cast: str = "bigint",
    version: int | None = None,
) -> DataFrame:
    """Range scan of a snapshot that schedules ONLY the files whose
    recorded (or footer-read, for stats-less adds) envelope
    intersects [lo, hi] — time travel and manifest pruning composed:
    the log says which files ARE the table at ``version``, the
    log-first zone map says which of those can match, and the exact
    predicate still applies (and pushes down) inside the survivors.
    Live deletion vectors apply exactly as in :func:`read_snapshot`
    (merge-on-read — a pruned scan must never resurrect MOR-deleted
    rows); the no-DV plan is the bare pruned scan, unchanged."""
    from .zonemap import prune_files

    zm = snapshot_zonemap(spark, table_dir, [col], version)
    keep = set(prune_files(zm, col, lo, hi, cast))
    files = [f for f in snapshot_files(table_dir, version) if f in keep]
    if not files:
        return read_snapshot(spark, table_dir, version).filter(F.lit(False))
    # schema-aware like every reader: on an evolved table a surviving
    # pre-widening file must serve the new columns as NULL, not let a
    # narrow footer win the inference and silently drop them
    reader = spark.read
    logged = table_schema(table_dir, version)
    if logged:
        reader = reader.schema(_schema_ddl(logged))
    scan = reader.parquet(
        *[os.path.join(table_dir, f) for f in files]
    )
    dvs = snapshot_dvs(table_dir, version)
    if dvs:
        scan = strip_deleted_rows(spark, scan, table_dir, dvs, files)
    return scan.filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def range_candidate_files(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    lo,
    hi,
    cast: str = "bigint",
    recorded: dict[str, dict] | None = None,
) -> list[str]:
    """Active files whose ``key_col`` envelope can possibly hold a
    row in ``[lo, hi]`` — the shared pre-plan file cut of both
    row-level DELETE paths (copy-on-write ``sinks/merge.py
    delete_from_snapshot`` and merge-on-read ``operators/mor.py
    delete_from_snapshot_mor``).  Log-first manifest, guarded exactly
    like ``prune_files``: an envelope whose recorded ordering
    disagrees with the cast's comparison class raises (never a silent
    wrong prune), a ``try_cast`` that loses width yields NULL which
    KEEPS the file, and NULL-stat files are always candidates —
    never skip blind."""
    from .zonemap import _CAST_ORD

    from .zonemap import prune_file_rows

    required = _CAST_ORD.get(cast.lower().split("(")[0])
    if required is None:
        raise ValueError(f"unsupported delete key cast {cast!r}")
    if lo is None or hi is None:
        raise ValueError("delete bounds must be non-NULL")
    zrows = snapshot_zonemap_rows(table_dir, [key_col], recorded=recorded)
    guard_zonemap_ordering(zrows, key_col, cast, required, "delete")
    # driver-side fast path: the envelope-vs-range cut is a few
    # integer compares over file-count-sized driver data — minting a
    # Spark job for it bills ~0.3-0.4 s of analysis per DELETE plan.
    # Exact-or-bail (zonemap.prune_file_rows): falls through to the
    # expression path whenever a stat is outside the verified
    # try_cast grammar.
    fast = prune_file_rows(zrows, key_col, lo, hi, cast)
    if fast is not None:
        return fast
    zm = local_rows_df(
        spark,
        zrows,
        "file string, col string, n_rows long, "
        "vmin string, vmax string, ord string",
    )
    cmin = F.expr(f"try_cast(vmin as {cast})")
    cmax = F.expr(f"try_cast(vmax as {cast})")
    keep_rows = zm.filter(
        F.col("vmin").isNull()
        | cmin.isNull()
        | cmax.isNull()
        | ((cmin <= F.lit(hi)) & (cmax >= F.lit(lo)))
    )
    return sorted(r["file"] for r in keep_rows.select("file").collect())


def key_candidate_files(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: DataFrame,
    cast: str = "bigint",
    recorded: dict[str, dict] | None = None,
) -> list[str]:
    """Active files whose ``key_col`` envelope can possibly hold ANY
    of the ``keys`` — the key-set sibling of
    :func:`range_candidate_files` (the MOR upsert's pre-plan cut;
    the COW merge keeps its richer envelope+bloom cut inline).  Same
    guards: ordering mismatch raises, an uncastable or NULL envelope
    keeps the file — never skip blind."""
    from .zonemap import _CAST_ORD

    required = _CAST_ORD.get(cast.lower().split("(")[0])
    if required is None:
        raise ValueError(f"unsupported merge key cast {cast!r}")
    zrows = snapshot_zonemap_rows(table_dir, [key_col], recorded=recorded)
    guard_zonemap_ordering(zrows, key_col, cast, required, "key")
    zm = local_rows_df(
        spark,
        zrows,
        "file string, col string, n_rows long, "
        "vmin string, vmax string, ord string",
    )
    cmin = F.expr(f"try_cast(vmin as {cast})")
    cmax = F.expr(f"try_cast(vmax as {cast})")
    rows = (
        keys.select(F.col(key_col).alias("_k"))
        .join(
            F.broadcast(zm),
            F.col("vmin").isNull()
            | cmin.isNull()
            | cmax.isNull()
            | ((cmin <= F.col("_k")) & (cmax >= F.col("_k"))),
            "inner",
        )
        .select("file")
        .distinct()
        .collect()
    )
    return sorted(r["file"] for r in rows)


def stats_for_files(
    table_dir: str, files: list[str], cols: list[str]
) -> dict[str, dict]:
    """Footer-walk ``cols`` stats for ``files`` in the
    ``commit_version(stats=...)`` shape — what a writer calls on the
    files it just produced, before committing them."""
    from .zonemap import file_column_stats

    out: dict[str, dict] = {}
    for name in files:
        st: dict[str, dict] = {}
        for _, c, n, vmin, vmax, ordv in file_column_stats(
            os.path.join(table_dir, name), cols
        ):
            st[c] = {"n_rows": n, "vmin": vmin, "vmax": vmax, "ord": ordv}
        out[name] = st
    return out


def _replay(
    table_dir: str, version: int | None
) -> tuple[set[str], int, list[int]]:
    """Active set at ``version`` plus the resolved version AND the
    single log listing it was computed from.  Every replay-style
    reader (``file_stats``, ``snapshot_dvs``, ``table_schema``) MUST
    drive its own delta loop from this returned listing rather than
    re-listing the log: with ``version=None`` a commit landing
    between two listings would make ``_replay`` resolve the NEWER
    head while the caller's delta loop iterates a list that stops
    short of it — silently missing the newest entry's dv_adds /
    stats / schema (the loop-listing ⊇ replay-listing invariant)."""
    versions = log_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshot log under {table_dir!r}")
    head = versions[-1]
    v = head if version is None else int(version)
    if v not in versions:
        raise ValueError(f"version {v} not in log (head {head})")
    # checkpoint-seeded: start from the newest checkpoint ≤ v and
    # replay only the delta — head reads on a long-lived table cost
    # O(commits since last checkpoint), not O(all commits)
    active: set[str] = set()
    start = 0
    ck = _latest_ckpt(table_dir, v, versions)
    if ck:
        active = set(ck["active"])
        start = ck["version"]
    for n in versions:
        if n <= start:
            continue
        if n > v:
            break
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        active |= set(e["adds"])
        active -= set(e["removes"])
    return active, v, versions


def snapshot_files(table_dir: str, version: int | None = None) -> list[str]:
    """Table-relative file names active at ``version`` (default:
    head), by replaying the log — sorted, so downstream plans are
    deterministic."""
    active, _, _ = _replay(table_dir, version)
    return sorted(active)


def snapshot_dvs(
    table_dir: str, version: int | None = None
) -> dict[str, list[str]]:
    """Deletion-vector sidecars LIVE at ``version``:
    ``{sidecar: [covered active data files]}`` (merge-on-read DML —
    operators/mor.py).  Replay mirrors the active-set replay: a
    ``dv_adds`` entry assigns the sidecar's coverage, every file
    remove prunes that file from all coverage, and a sidecar whose
    coverage empties drops out — so a rewrite that removes the
    covered files (purge/zorder/compaction/merge) retires the DV by
    construction, and a later re-add of a removed NAME can never
    resurrect a dead DV (the prune happened when the remove
    replayed).  Empty dict = copy-on-write reads, zero overhead."""
    # one log listing per read (the list _replay resolved against) —
    # a second listing here could see a commit _replay's didn't,
    # or vice versa with version=None (see _replay's docstring)
    _, v, versions = _replay(table_dir, version)
    cov: dict[str, set[str]] = {}
    start = 0
    ck = _latest_ckpt(table_dir, v, versions)
    if ck:
        cov = {s: set(c) for s, c in ck.get("dvs", {}).items()}
        start = ck["version"]
    for n in versions:
        if n <= start:
            continue
        if n > v:
            break
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        for s, files in (e.get("dv_adds") or {}).items():
            cov[s] = set(files)
        for name in e["removes"]:
            for s in list(cov):
                cov[s].discard(name)
                if not cov[s]:
                    del cov[s]
    return {s: sorted(files) for s, files in cov.items()}


def strip_deleted_rows(
    spark: SparkSession,
    scan: DataFrame,
    table_dir: str,
    dvs: dict[str, list[str]],
    files: list[str] | None = None,
    keep_tags: bool = False,
    broadcast_max_bytes: int = 64 << 20,
):
    """Anti-join DV-deleted row positions out of ``scan`` — the
    merge-on-read read path shared by :func:`read_snapshot` and every
    copy-on-write rewriter that reads raw parquet file subsets
    (compaction, COW MERGE/DELETE — a rewrite that ignored DVs would
    RESURRECT deleted rows into the new files).

    ``scan`` must be a parquet scan of files under ``table_dir`` (the
    hidden ``_metadata`` columns must still resolve — tag before any
    projection drops them); ``files`` restricts the DV build side to
    the files actually being read.  Row identity is
    ``(_metadata.file_name, _metadata.row_index)`` — Spark's parquet
    row index is the physical position in the file, the exact
    identity a Delta deletion vector / Iceberg position delete keys
    on.  The DV side is broadcast while its sidecars total under
    ``broadcast_max_bytes`` (a DV is bounded by deletes since the
    last purge — small by maintenance contract); past that it
    degrades to a shuffled anti-join rather than an executor OOM.

    ``keep_tags=True`` returns the frame WITH the internal
    ``MOR_FILE_TAG``/``MOR_POS_TAG`` columns (the MOR DML writers
    need the positions they are about to record); default drops
    them."""
    fcol, pcol = MOR_FILE_TAG, MOR_POS_TAG
    clash = [c for c in (fcol, pcol) if c in scan.columns]
    if clash:
        raise ValueError(f"scan already has internal columns {clash}")
    covered: set[str] = set()
    for cov in dvs.values():
        covered.update(cov)
    if files is not None:
        covered &= set(files)
    data_cols = list(scan.columns)
    tagged = scan.select(
        "*",
        F.col("_metadata.file_name").alias(fcol),
        F.col("_metadata.row_index").alias(pcol),
    )
    if not covered:
        return tagged if keep_tags else scan
    sidecars = sorted(s for s, cov in dvs.items() if set(cov) & covered)
    # LOUD on a torn/foreign sidecar: reading one with the explicit
    # schema would serve NULL positions, the anti-join would match
    # nothing, and every deleted row would silently RESURRECT — the
    # one failure mode a deletion vector must never have.  Footer
    # checks are driver-side and sidecar-count bounded (a DV set is
    # small by maintenance contract).
    import pyarrow.parquet as _pq

    for s in sidecars:
        try:
            footer = _pq.ParquetFile(
                os.path.join(table_dir, s)
            ).schema_arrow
        except Exception as exc:
            raise ValueError(
                f"unreadable deletion-vector sidecar {s!r}: {exc}"
            ) from exc
        names = set(footer.names)
        if not {"file", "pos"} <= names:
            raise ValueError(
                f"deletion-vector sidecar {s!r} lacks (file, pos) "
                f"columns — found {sorted(names)}; refusing a read "
                "that would silently resurrect deleted rows"
            )
    total = sum(
        os.path.getsize(os.path.join(table_dir, s)) for s in sidecars
    )
    # DV side renamed to internal names: a TABLE column called
    # "file"/"pos" must not make the join condition ambiguous
    dv = (
        spark.read.schema("file string, pos long")
        .parquet(*[os.path.join(table_dir, s) for s in sidecars])
        .where(F.col("file").isin(sorted(covered)))
        .select(
            F.col("file").alias("__sps_dv_file"),
            F.col("pos").alias("__sps_dv_pos"),
        )
    )
    if total <= broadcast_max_bytes:
        dv = F.broadcast(dv)
    out = tagged.join(
        dv,
        (F.col(fcol) == F.col("__sps_dv_file"))
        & (F.col(pcol) == F.col("__sps_dv_pos")),
        "left_anti",
    )
    return out if keep_tags else out.select(*data_cols)


def table_schema(
    table_dir: str, version: int | None = None
) -> list[list[str]] | None:
    """The logged table schema in force AT ``version`` (latest
    schema-carrying entry ≤ v wins), or None when no entry ever
    recorded one — pre-evolution tables read footer schemas exactly
    as before."""
    # single listing shared with _replay — see its docstring
    _, v, versions = _replay(table_dir, version)
    out: list[list[str]] | None = None
    start = 0
    ck = _latest_ckpt(table_dir, v, versions)
    if ck:
        out = (
            [list(c) for c in ck["schema"]] if ck.get("schema") else None
        )
        start = ck["version"]
    for n in versions:
        if n <= start:
            continue
        if n > v:
            break
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        if e.get("schema"):
            out = [list(c) for c in e["schema"]]
    return out


def _schema_ddl(cols: list[list[str]]) -> str:
    return ", ".join(f"`{n}` {t}" for n, t in cols)


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Scan EXACTLY the files of the requested snapshot.

    When the log carries a recorded schema at ``version`` (schema
    evolution — see :func:`commit_version`), the scan reads with
    that EXPLICIT schema: files written before a widening serve the
    new columns as NULL, and no footer sweep (mergeSchema) is
    needed.  An all-files-removed version reads as an empty table
    with the schema in force at that version (a filter-false scan of
    one historically-known file — metadata-only, no data pages).

    MERGE-ON-READ: when deletion-vector sidecars are live at
    ``version`` (operators/mor.py), the scan anti-joins their row
    positions out (:func:`strip_deleted_rows`), so every reader —
    summaries, time travel, the COW rewriters' schema probe — sees
    the post-delete table without a rewrite.  A version with no live
    DVs (every existing table) keeps the exact bare-scan plan."""
    files = snapshot_files(table_dir, version)
    logged = table_schema(table_dir, version)
    reader = spark.read
    if logged:
        reader = reader.schema(_schema_ddl(logged))
    if files:
        scan = reader.parquet(
            *[os.path.join(table_dir, f) for f in files]
        )
        dvs = snapshot_dvs(table_dir, version)
        if dvs:
            scan = strip_deleted_rows(spark, scan, table_dir, dvs, files)
        return scan
    # empty snapshot: recover the schema from ANY file ever logged
    for n in log_versions(table_dir):
        with open(_entry_path(table_dir, n)) as f:
            adds = json.load(f)["adds"]
        if adds:
            return (
                reader.parquet(os.path.join(table_dir, adds[0]))
                .filter(F.lit(False))
            )
    raise ValueError(f"log under {table_dir!r} never added a file")


def version_at_timestamp(table_dir: str, ts: float) -> int:
    """Resolve TIMESTAMP AS OF semantics (Delta's rule): the LATEST
    version whose commit time is ≤ ``ts`` (epoch seconds).  Raises
    when ``ts`` predates the first commit — "the table did not exist
    yet" is an error, not an empty read.  Entries with no ``ts``
    field (written before commit timestamps existed) INHERIT their
    parent's commit time causally: a no-ts PREFIX is treated as the
    unknown past (resolves for any requested time — the
    backward-compatible reading for wholly-legacy logs), while a
    no-ts entry that FOLLOWS a timestamped one cannot predate its
    parent — it resolves only for times its parent also resolves
    for.  (The alternative — treating a late legacy entry as the
    unknown past — would let a query time from before the table
    existed resolve to one of its newest versions.)  Expiry
    preserves the cut version's ORIGINAL time on its baseline
    rewrite, so maintenance never shifts resolution.

    Commit timestamps are STRICTLY increasing by construction for
    every log this engine writes (``commit_version`` clamps each
    entry's ts to ``max(wall clock, parent_ts + 1 ms)`` — Delta's
    commit-timestamp adjustment, tie-proof even for same-millisecond
    commits).  LEGACY logs written before the clamp (raw wall clock)
    can carry NON-monotone timestamps under writer clock skew, and a
    break at the first entry past ``ts`` — the r12 fast path — would
    either misresolve or raise on a query time sitting between
    out-of-order entries; a later dip is undetectable without
    reading past the break, so no early-exit scheme is exact for
    them (ADVICE r12).  The resolver therefore reads EVERY entry's
    timestamp: latest version with effective ts ≤ ``ts`` over the
    whole log, exact for clamped and legacy logs alike.  Cost
    context: this is one tiny JSON read per version — metadata of
    the same order the log listing itself touches, and far below the
    checkpoint-seeded DATA replay the resolved read then performs —
    so exactness is bought for noise."""
    versions = log_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshot log under {table_dir!r}")
    best: int | None = None
    eff: float | None = None  # effective ts after legacy inheritance
    for n in versions:
        with open(_entry_path(table_dir, n)) as f:
            e_ts = json.load(f).get("ts")
        if e_ts is not None:
            eff = float(e_ts)
        # a no-ts entry keeps the previous eff (inherits its
        # parent's commit time; a wholly-None prefix keeps None =
        # the unknown past, which resolves for any query time)
        if eff is None or eff <= float(ts):
            best = n
    if best is None:
        raise ValueError(
            f"timestamp {ts} predates the first commit of {table_dir!r}"
        )
    return best


def read_snapshot_asof(
    spark: SparkSession, table_dir: str, ts: float
) -> DataFrame:
    """``SELECT ... TIMESTAMP AS OF ts``: scan the snapshot that was
    current at ``ts`` (see :func:`version_at_timestamp`)."""
    return read_snapshot(spark, table_dir, version_at_timestamp(table_dir, ts))


def snapshot_history(
    spark: SparkSession, table_dir: str
) -> DataFrame:
    """One row per version: ``version, ts, n_adds, n_removes,
    n_active`` — the DESCRIBE HISTORY shape, log-sized (``ts`` is
    the commit wall-clock in epoch seconds; NULL for entries from
    before commit timestamps existed)."""
    rows = []
    active: set[str] = set()
    for n in log_versions(table_dir):
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        active |= set(e["adds"])
        active -= set(e["removes"])
        ts = e.get("ts")
        rows.append(
            (
                n,
                float(ts) if ts is not None else None,
                len(e["adds"]),
                len(e["removes"]),
                len(active),
            )
        )
    return local_rows_df(
        spark,
        rows,
        "version int, ts double, n_adds int, n_removes int, n_active int",
    )


def snapshot_summary_oracle(
    table_dir: str,
    versions: list[int],
    agg_col: str,
) -> str:
    """DuckDB SQL summarizing each requested snapshot by reading the
    SAME file lists an independent replay of the log produces:
    ``version, n_rows, total`` (decimal-summed ``agg_col``).  A wrong
    replay, add/remove mixup, or torn commit shows up as a row-count
    or sum mismatch."""
    parts = []
    for v in versions:
        files = snapshot_files(table_dir, v)
        if files:
            lst = ", ".join(
                f"'{os.path.join(table_dir, f)}'" for f in files
            )
            src = f"read_parquet([{lst}])"
            parts.append(
                f"SELECT {v} AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,"
                f" CAST(COALESCE(SUM(CAST({agg_col} AS DECIMAL(18,2))), 0)"
                f" AS DOUBLE) AS total FROM {src}"
            )
        else:
            parts.append(
                f"SELECT {v} AS version, CAST(0 AS BIGINT) AS n_rows,"
                f" CAST(0 AS DOUBLE) AS total"
            )
    return "\nUNION ALL\n".join(parts)


def time_travel_summary_oracle(
    key_col: str,
    agg_col: str,
    m: int = 24,
    probes: tuple[int, ...] = (8, 12, 18, 24, 26),
    table: str = "orders",
) -> str:
    """Closed-form DuckDB oracle for the queued checkpoint +
    TIMESTAMP AS OF gate (q:snapshot_time_travel — queued r12 per
    VERDICT r11 #5; register r13).  The gate stages ``table`` as
    ``m`` single-slice commits (commit v adds the rows with
    ``key_col % m == v-1``), writes a LOG CHECKPOINT mid-stream (at
    v = m/2), then commits v=m+1 removing slices {0,1} and v=m+2
    removing slice {2}, and summarizes each probe version TWICE —
    once via ``read_snapshot(version)`` and once via
    ``read_snapshot_asof`` at the entry's pinned commit epoch — so
    checkpoint-seeded replay ≡ full replay ≡ timestamp resolution
    all land under the driver's one value hash (probes below the
    checkpoint must ignore it; probes above must seed from it; every
    as-of read must resolve to exactly its pinned version).  Content
    at probe v ≤ m is ``key % m < v``; after the removes, v=m+1 is
    ``key % m >= 2`` and v=m+2 is ``key % m >= 3``."""

    def pred(v: int) -> str:
        if v <= m:
            return f"{key_col} % {m} < {v}"
        if v == m + 1:
            return f"{key_col} % {m} >= 2"
        if v == m + 2:
            return f"{key_col} % {m} >= 3"
        raise ValueError(f"probe {v} beyond the staged history {m + 2}")

    blocks = []
    for v in probes:
        for path in ("version", "asof"):
            blocks.append(
                f"SELECT {v} AS version, '{path}' AS path,"
                f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
                f" CAST(COALESCE(SUM(CAST({agg_col} AS"
                f" DECIMAL(18,2))), 0) AS DOUBLE) AS total"
                f" FROM {table} WHERE {pred(v)}"
            )
    return "\nUNION ALL\n".join(blocks)


def snapshot_summary(
    spark: SparkSession,
    table_dir: str,
    versions: list[int],
    agg_col: str,
) -> DataFrame:
    """Spark side of :func:`snapshot_summary_oracle`: per-version
    row count + decimal sum over the time-travel scan.

    r13: versions with live data, a flat file layout, and one shared
    logged schema are FUSED into a single scan — per-(file,
    dv-sidecar) partial aggregates joined to a driver-local
    membership LocalRelation — instead of one scan+aggregate plan
    per version: a k-version summary was paying k relation builds
    and a k-branch union (driver planning dominated the gate wall;
    r13 job traces).  count/decimal-sum are exactly distributive
    over files, so the fused totals are bit-identical.  Versions
    that don't qualify (empty snapshots, or a schema-evolution
    boundary) keep the per-version path and are unioned after.

    DV-AWARE FUSION (r13 session 4 — the "designed but
    unimplemented" item from the session-3 log): versions with live
    deletion vectors fuse too.  The scan LEFT-joins the sidecars'
    (file, pos) rows, so every row lands in a partial-aggregate
    group keyed by (file, deleting-sidecar-or-live); a version's
    total is then the SUM of the groups live at it — its files'
    live groups, plus the groups of sidecars NOT live at it (their
    rows were still visible then).  Pure addition of disjoint
    partials: co-live sidecars are position-disjoint by the MOR
    writer contract (re-deletes are anti-joined out before a
    sidecar is written), and all arithmetic stays in the JVM
    decimal path, so the result is bit-identical to the
    per-version anti-join read.

    Fire threshold, measured not asserted: >4 qualifying versions,
    with or without DVs.  AQE executes independent per-version
    branches CONCURRENTLY (one stage deep, and concurrently with
    the gate's other subtrees under the same action), while any
    fused shape is a serialized chain — fusing the DML gate's
    3-version summary regressed ~1.5 s, fusing the 4-version MOR
    gate regressed ~1.0 s in both the join-shaped and
    collect-shaped variants (stash-paired, r13 session 4), and
    fusing the 10-probe time-travel gate cut it 3.6 → 1.8 s
    (join-shaped, session 3) and a further −20% (collect-shaped,
    session 4)."""
    from ..functions.localrel import local_rows_df

    infos = []
    for v in versions:
        files = snapshot_files(table_dir, v)
        dvs = snapshot_dvs(table_dir, v)
        sch = table_schema(table_dir, v)
        infos.append((int(v), files, dvs, sch))
    qualifying = [
        (v, files, dvs)
        for v, files, dvs, sch in infos
        if files
        and sch == infos[0][3]
        and all(os.sep not in f for f in files)
        and all(os.sep not in s for s in dvs)
    ]
    fused = qualifying if len(qualifying) > 4 else []
    out = None
    if fused:
        all_files = sorted({f for _, fl, _ in fused for f in fl})
        # sidecars live at any fused version, with the union of their
        # per-version coverages — the (sidecar, file) pairs whose
        # positions must be split out of the live groups
        cov_any: dict[str, set[str]] = {}
        for _, _, dvs in fused:
            for s, cov in dvs.items():
                cov_any.setdefault(s, set()).update(cov)
        file_set = set(all_files)
        pairs = sorted(
            (s, f)
            for s, cov in cov_any.items()
            for f in cov
            if f in file_set
        )
        reader = spark.read
        if infos[0][3]:
            reader = reader.schema(_schema_ddl(infos[0][3]))
        scan = reader.parquet(
            *[os.path.join(table_dir, f) for f in all_files]
        )
        rows = scan.select(
            F.col(agg_col).alias("_v"),
            F.col("_metadata.file_name").alias("_f"),
            F.col("_metadata.row_index").alias("_p"),
        )
        if pairs:
            sidecars = sorted({s for s, _ in pairs})
            # LOUD on a torn/foreign sidecar — same contract as
            # strip_deleted_rows: serving NULL positions would leave
            # deleted rows in the live group silently.  Driver-side,
            # sidecar-count bounded.
            import pyarrow.parquet as _pq

            for s in sidecars:
                try:
                    footer = _pq.ParquetFile(
                        os.path.join(table_dir, s)
                    ).schema_arrow
                except Exception as exc:
                    raise ValueError(
                        f"unreadable deletion-vector sidecar {s!r}:"
                        f" {exc}"
                    ) from exc
                if not {"file", "pos"} <= set(footer.names):
                    raise ValueError(
                        f"deletion-vector sidecar {s!r} lacks"
                        " (file, pos) columns — refusing a summary"
                        " that would silently resurrect deleted rows"
                    )
            total = sum(
                os.path.getsize(os.path.join(table_dir, s))
                for s in sidecars
            )
            # pair-level filter (not file-level): a sidecar can hold
            # positions for a file whose coverage it lost at every
            # fused version; those rows must stay in the live group
            dv = (
                spark.read.schema("file string, pos long")
                .parquet(*[os.path.join(table_dir, s) for s in sidecars])
                .select(
                    F.col("file").alias("_df"),
                    F.col("pos").alias("_dp"),
                    F.col("_metadata.file_name").alias("_ds"),
                )
                .where(
                    F.concat_ws("/", F.col("_ds"), F.col("_df")).isin(
                        [f"{s}/{f}" for s, f in pairs]
                    )
                )
            )
            if total <= 64 << 20:
                dv = F.broadcast(dv)
            rows = rows.join(
                dv,
                (F.col("_f") == F.col("_df"))
                & (F.col("_p") == F.col("_dp")),
                "left",
            )
            grouped = rows.select(
                "_v", "_f", F.coalesce(F.col("_ds"), F.lit("")).alias("_s")
            )
        else:
            grouped = rows.select("_v", "_f", F.lit("").alias("_s"))
        per_fs = grouped.groupBy("_f", "_s").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_v").cast("decimal(18,2)")).alias("_t"),
        )
        # The partials are manifest-sized (files × (sidecars + 1)
        # upper bound), so the membership join + per-version rollup
        # assemble DRIVER-SIDE — one distributed job instead of a
        # sequential join+agg stage chain (the join-shaped fusion
        # measured SLOWER than the concurrent per-version branches
        # at gate scale; per-operator log).  Python Decimal addition
        # is exact like JVM decimal addition; the engine-sensitive
        # decimal→double cast stays in the JVM below.
        from decimal import Decimal

        pf = {(r["_f"], r["_s"]): (r["_n"], r["_t"]) for r in per_fs.collect()}
        vrows = []
        for v, fl, dvs in fused:
            fset = set(fl)
            keys = [(f, "") for f in fl]
            for s, cov in cov_any.items():
                live_cov = set(dvs.get(s, []))
                keys.extend(
                    (f, s)
                    for f in cov
                    if f in fset and f not in live_cov
                )
            n = 0
            t = Decimal(0)
            for k in keys:
                g = pf.get(k)
                if g:
                    n += g[0]
                    if g[1] is not None:
                        t += g[1]
            vrows.append((v, n, t))
        out = local_rows_df(
            spark, vrows, "version int, n_rows long, total decimal(38,2)"
        ).select(
            "version",
            "n_rows",
            F.col("total").cast("double").alias("total"),
        )
    fused_vs = {v for v, _, _ in fused}
    for v, files, dvs, sch in infos:
        if v in fused_vs:
            continue
        s = read_snapshot(spark, table_dir, v).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.col(agg_col).cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("total"),
        ).select(F.lit(v).cast("int").alias("version"), "n_rows", "total")
        out = s if out is None else out.unionByName(s)
    return out


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int,
    stats_cols: list[str] | None = None,
) -> dict:
    """Execute an OPTIMIZE pass over the snapshot's ACTIVE files as
    ONE atomic log commit — the execution half of the compaction
    planner (operators/compaction.py decides the bins; this rewrites
    them).  Bins holding a single file are left untouched BY NAME
    (rewriting a lone file buys nothing and churns the cache); every
    multi-file bin is read once and rewritten as one file; the
    commit swaps remove(binned small files) + add(compacted files)
    atomically, so concurrent readers of the previous snapshot are
    never torn and time travel keeps serving the pre-compaction
    layout.  Returns ``{"version", "n_rewritten", "n_kept",
    "adds"}`` with ``version=None`` when the layout is already
    optimal (the no-op makes repeated maintenance idempotent)."""
    import shutil
    import uuid

    from .compaction import compaction_plan

    planned = plan_head(table_dir)
    active = snapshot_files(table_dir)
    manifest = local_rows_df(
        spark,
        [
            (f, os.path.getsize(os.path.join(table_dir, f)))
            for f in active
        ],
        "file string, bytes long",
    )
    plan = compaction_plan(manifest, "bytes", "file", target_bytes)
    bins: dict[int, list[str]] = {}
    for r in plan.collect():  # manifest-sized
        bins.setdefault(int(r["bin"]), []).append(r["file"])
    adds: list[str] = []
    removes: list[str] = []
    tag = uuid.uuid4().hex[:8]
    logged = table_schema(table_dir)
    dvs = snapshot_dvs(table_dir)
    for b, fs in sorted(bins.items()):
        if len(fs) < 2:
            continue
        # schema-aware: compacting pre-widening files must carry the
        # evolved columns (as NULL), not freeze the narrow footer
        reader = spark.read
        if logged:
            reader = reader.schema(_schema_ddl(logged))
        merged = reader.parquet(
            *[os.path.join(table_dir, f) for f in sorted(fs)]
        )
        if dvs:
            # merge-on-read interplay: a bin rewrite that ignored
            # live deletion vectors would RESURRECT deleted rows into
            # the compacted file; applying them here also PURGES the
            # bin's DVs (the remove prunes their coverage — see
            # snapshot_dvs), exactly Delta's OPTIMIZE-over-DVs move.
            # Single-file bins keep their file AND its coverage.
            merged = strip_deleted_rows(
                spark, merged, table_dir, dvs, sorted(fs)
            )
        merged = merged.coalesce(1)
        staging = os.path.join(table_dir, f"_tmp_compact_{tag}_{b}")
        merged.write.mode("overwrite").parquet(staging)
        parts = sorted(
            p for p in os.listdir(staging) if p.endswith(".parquet")
        )
        if len(parts) != 1:  # coalesce(1) guarantees this; never
            raise RuntimeError(  # silently drop a straggler part
                f"expected one compacted part, got {len(parts)}"
            )
        name = f"compact-{tag}-{b:05d}.parquet"
        os.rename(os.path.join(staging, parts[0]), os.path.join(table_dir, name))
        shutil.rmtree(staging, ignore_errors=True)
        adds.append(name)
        removes.extend(sorted(fs))
    # a bin whose every row was DV-deleted compacts to a 0-row file:
    # its sources still leave the table, but the empty replacement
    # must not enter the manifest (NULL-stat files defeat pruning)
    adds = _drop_empty_parts(table_dir, adds)
    if not removes:
        return {
            "version": None,
            "n_rewritten": 0,
            "n_kept": len(active),
            "adds": [],
        }
    # failed commit ⇒ remove the renamed compacted files (log-driven
    # readers never saw them; this keeps raw dir consumers and disk
    # clean too).  Hard crashes are mopped up by vacuum_orphans.
    # stats_cols (optional) records the compacted files' envelopes in
    # the commit, so later merges/prunes plan them log-first.
    try:
        version = commit_version(
            table_dir,
            adds=adds,
            removes=removes,
            stats=(
                stats_for_files(table_dir, adds, stats_cols)
                if stats_cols
                else None
            ),
            planned_version=planned,
            # layout-only: logical content identical to the parent
            # (DVs applied above were already logically deleted), so
            # change-feed readers skip this commit
            data_change=False,
        )
    except BaseException:
        for name in adds:
            try:
                os.remove(os.path.join(table_dir, name))
            except OSError:
                pass
        raise
    return {
        "version": version,
        "n_rewritten": len(removes),
        "n_kept": len(active) - len(removes),
        "adds": adds,
    }


def checkpoint_snapshot(table_dir: str) -> dict:
    """Write a LOG CHECKPOINT at the current head — the Delta
    ``_last_checkpoint`` move, without giving up any history: the
    full replayed state (active files, per-file stats/blooms, live
    deletion-vector coverage, evolved schema) lands as ONE
    ``_sps_log/ckpt-v{N}.json``, and every reader
    (:func:`snapshot_files`, :func:`file_stats`,
    :func:`snapshot_dvs`, :func:`table_schema`, and everything built
    on them) seeds its replay from the newest checkpoint ≤ the
    requested version, paying O(commits since checkpoint) instead of
    O(all commits).

    Why this matters at 100 TB: a standing ingestion stream commits
    a version per micro-batch — thousands of entries per day — and
    WITHOUT a checkpoint every plan (merge candidate cut, pruned
    scan, DV build) re-reads the whole entry chain driver-side.
    Time travel is untouched: a read at a version BELOW a checkpoint
    simply ignores it (only checkpoints ≤ the target seed a replay),
    and unlike :func:`expire_snapshots` no history is deleted.

    Idempotent and crash-safe: content is a pure function of the log
    at version N, written tmp + ``os.replace`` (atomic; two racers
    produce identical bytes).  A checkpoint whose version later
    EXPIRES is deleted by ``expire_snapshots`` (and skipped by
    readers in the crash window) because its forward deltas may be
    gone.  Run it from maintenance (``expire_snapshots`` writes one
    at the surviving head automatically) or every N commits on hot
    tables.  Returns ``{"version", "n_active", "n_dvs"}``."""
    versions = log_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshot log under {table_dir!r}")
    head = versions[-1]
    # ONE walk accumulates all four state facets (the four public
    # readers each pay their own walk; a checkpoint on the streaming
    # hot path should not pay it four times — review r11)
    active: set[str] = set()
    stats: dict[str, dict] = {}
    cov: dict[str, set[str]] = {}
    schema: list[list[str]] | None = None
    start = 0
    prior = _latest_ckpt(table_dir, head, versions)
    if prior:
        active = set(prior["active"])
        stats = {f: dict(st) for f, st in prior.get("stats", {}).items()}
        cov = {s: set(c) for s, c in prior.get("dvs", {}).items()}
        schema = (
            [list(c) for c in prior["schema"]]
            if prior.get("schema")
            else None
        )
        start = prior["version"]
    for n in versions:
        if n <= start:
            continue
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        active |= set(e["adds"])
        active -= set(e["removes"])
        for name in e["adds"]:
            stats[name] = {}
        for name, st in (e.get("stats") or {}).items():
            stats[name] = st
        for name in e["removes"]:
            stats.pop(name, None)
        for s, files in (e.get("dv_adds") or {}).items():
            cov[s] = set(files)
        for name in e["removes"]:
            for s in list(cov):
                cov[s].discard(name)
                if not cov[s]:
                    del cov[s]
        if e.get("schema"):
            schema = [list(c) for c in e["schema"]]
    ck = {
        "version": head,
        "active": sorted(active),
        "stats": {f: stats.get(f, {}) for f in sorted(active)},
        "dvs": {s: sorted(c) for s, c in cov.items()},
        "schema": schema,
    }
    import uuid as _uuid

    # the ".tmp-" suffix puts a crashed writer's debris under
    # vacuum_orphans' existing claim-tmp reclaim pattern
    tmp = _ckpt_path(table_dir, head) + f".tmp-{_uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(ck, f)
    os.replace(tmp, _ckpt_path(table_dir, head))
    return {
        "version": head,
        "n_active": len(active),
        "n_dvs": len(ck["dvs"]),
    }


def expire_snapshots(table_dir: str, keep_last: int = 7) -> dict:
    """Retention + log compaction in one maintenance pass — the
    remaining lifecycle half of a table format (Delta checkpoint +
    VACUUM): versions older than the newest ``keep_last`` stop being
    queryable, the oldest RETAINED version's entry is rewritten as a
    self-contained BASELINE (its full active file set, carrying
    forward every recorded stat/bloom so later merges keep planning
    log-first), the expired entries are deleted, and data files whose
    last reference died with them are removed from disk.

    Crash-safe at every step, by construction of the replay:
    1. the baseline entry replaces the cut version via ``os.replace``
       (atomic).  A replay that still sees the older entries PLUS the
       baseline computes the SAME active set: adds are set-unions
       (re-adding already-active files is idempotent) and the
       baseline carries EXPLICIT removes for everything the cut
       version dropped, so the stale prefix cannot resurrect a
       removed file through the union;
    2. expired entry files are deleted (a crash part-way leaves some
       history readable, never a wrong answer);
    3. now-unreferenced data files are deleted; a crash before this
       step leaves files that ``vacuum_orphans`` classifies as
       orphans (their add entries are gone), so the next maintenance
       pass reclaims them.

    Returns ``{"cut_version", "n_expired_versions",
    "deleted_files"}``; a log shorter than ``keep_last`` no-ops.

    CONCURRENCY CONTRACT (same single-maintenance-writer rule as
    ``vacuum_orphans``): concurrent WRITERS are protected — a commit
    racing an expiry fails loudly (the read-set scan raises
    SnapshotConflictError when its planned version or a mid-scan
    entry expired; the claim loop re-validates) — but a concurrent
    READER that listed versions just before the deletion loop can
    hit FileNotFoundError on an expired entry mid-replay; it should
    simply retry (the post-expiry log replays the identical state
    for every surviving version, by the baseline construction
    above).  Run expiry from the maintenance slot, not beside
    latency-critical readers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = log_versions(table_dir)
    if len(versions) <= keep_last:
        return {
            "cut_version": None,
            "n_expired_versions": 0,
            "deleted_files": [],
        }
    cut = versions[-keep_last]
    expired = [v for v in versions if v < cut]
    # active set + carried stats at the cut, and every file the
    # expired prefix ever added (candidates for deletion)
    active_at_cut, _, _ = _replay(table_dir, cut)
    stats_at_cut = file_stats(table_dir, cut)
    dv_at_cut = snapshot_dvs(table_dir, cut)
    ever_pre_cut: set[str] = set()
    dv_pre_cut: set[str] = set()
    for v in expired + [cut]:
        with open(_entry_path(table_dir, v)) as f:
            e = json.load(f)
        ever_pre_cut |= set(e["adds"])
        dv_pre_cut |= set(e.get("dv_adds") or {})
    # files still referenced by ANY retained version: active at cut,
    # or (re)added by a retained entry after the cut.  DV sidecars
    # live at the cut ride the baseline; ones referenced by a
    # retained entry stay for time travel; the rest are dead weight.
    referenced = set(active_at_cut)
    dv_referenced = set(dv_at_cut)
    for v in versions:
        if v > cut:
            with open(_entry_path(table_dir, v)) as f:
                e = json.load(f)
            referenced |= set(e["adds"])
            dv_referenced |= set(e.get("dv_adds") or {})
    doomed = sorted(
        (ever_pre_cut - referenced) | (dv_pre_cut - dv_referenced)
    )
    # the baseline must carry EXPLICIT removes for everything active
    # just before the cut that the cut version dropped: replay is a
    # set-union of adds, so during the crash window where the old
    # entries still coexist with the baseline, a removes-free
    # baseline would RESURRECT files the original cut entry removed
    # (the prefix re-contributes them and nothing subtracts them).
    # With the removes present, both replays agree: prefix ∪ adds −
    # removes = active(cut) mid-crash, and adds − removes =
    # active(cut) after the prefix is deleted (replay subtracts
    # without validating, so removes of already-absent names are
    # harmless there).
    active_before_cut, _, _ = _replay(table_dir, expired[-1])
    baseline = {
        "version": cut,
        "adds": sorted(active_at_cut),
        "removes": sorted(active_before_cut - active_at_cut),
        "baseline": True,
    }
    # the cut version's ORIGINAL commit time must survive the
    # baseline rewrite, or TIMESTAMP AS OF resolution shifts under
    # maintenance
    with open(_entry_path(table_dir, cut)) as f:
        _cut_ts = json.load(f).get("ts")
    if _cut_ts is not None:
        baseline["ts"] = _cut_ts
    carried = {
        f: st for f, st in stats_at_cut.items() if st
    }
    if carried:
        baseline["stats"] = carried
    # the evolved schema must survive expiry exactly like stats do —
    # dropping the schema-carrying entry would silently revert every
    # later read to footer schemas (pre-widening files would then
    # resolve WITHOUT the new columns)
    schema_at_cut = table_schema(table_dir, cut)
    if schema_at_cut:
        baseline["schema"] = schema_at_cut
    # deletion vectors live at the cut must survive expiry exactly
    # like stats and schema — dropping their entries would RESURRECT
    # the deleted rows at the baseline version.  Replay semantics
    # make the crash window safe: dv_adds ASSIGNS coverage (last
    # entry wins), so prefix+baseline and baseline-alone replays
    # agree on the live set.
    if dv_at_cut:
        baseline["dv_adds"] = dv_at_cut
    tmp = _entry_path(table_dir, cut) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(baseline, f)
    os.replace(tmp, _entry_path(table_dir, cut))
    # delete NEWEST-expired first: a crash mid-loop then leaves a
    # contiguous prefix starting at v1, and every surviving version
    # still replays over its FULL history — oldest-first deletion
    # would leave expired entries whose prefix is gone, replaying a
    # silently wrong (smaller) active set for them
    for v in reversed(expired):
        try:
            os.remove(_entry_path(table_dir, v))
        except OSError:
            pass
    for name in doomed:
        try:
            os.remove(os.path.join(table_dir, name))
        except OSError:
            pass
    # checkpoints at expired versions are now dead: their forward
    # delta entries are gone, so seeding a replay from one would
    # compute a silently stale state (readers already skip them via
    # the version-in-log guard; this reclaims the files)
    for c in log_checkpoints(table_dir):
        if c < cut:
            try:
                os.remove(_ckpt_path(table_dir, c))
            except OSError:
                pass
    # maintenance leaves a fresh checkpoint at the surviving head so
    # post-expiry reads start O(1)-deep (checkpoint_snapshot doc)
    checkpoint_snapshot(table_dir)
    return {
        "cut_version": cut,
        "n_expired_versions": len(expired),
        "deleted_files": doomed,
    }


def vacuum_orphans(
    table_dir: str, grace_seconds: float = 0.0
) -> list[str]:
    """Delete ``*.parquet`` files in ``table_dir`` that NO log entry
    ever added — data files stranded by a writer that crashed between
    rename and commit.  Every file any version references (active or
    historically removed) is untouched, so time travel keeps working
    for the whole log.  Returns the deleted names, sorted.

    CONCURRENCY CONTRACT: "never committed" is only provably "dead"
    when no OTHER writer is mid-commit — a concurrent merge/compact
    renames its data files into the table dir BEFORE its log commit,
    and this vacuum would eat them in that window (the race Delta's
    VACUUM keeps a retention window for).  Run it with no concurrent
    writers, or pass ``grace_seconds`` > 0 to skip any candidate
    whose mtime is within the window (an in-flight writer's files are
    seconds old; a crash orphan is reclaimed by the NEXT pass).

    Return shape: data files as bare names, reclaimed commit-claim
    tmps as ``_sps_log/``-relative paths (they live in the log dir,
    not the table dir) — one sorted list."""
    import time

    ever: set[str] = set()
    for n in log_versions(table_dir):
        with open(_entry_path(table_dir, n)) as f:
            e = json.load(f)
        # deletion-vector sidecars are committed files too — eating
        # one would resurrect its deleted rows on every MOR read
        ever |= set(e["adds"]) | set(e.get("dv_adds") or {})
    if not ever:
        raise ValueError(f"no snapshot log under {table_dir!r}")
    cutoff = time.time() - grace_seconds
    gone = []
    for f in sorted(os.listdir(table_dir)):
        if f.endswith(".parquet") and f not in ever:
            path = os.path.join(table_dir, f)
            if grace_seconds > 0 and os.path.getmtime(path) > cutoff:
                continue
            os.remove(path)
            gone.append(f)
    # claim tmps stranded by a writer that crashed between staging
    # its entry and linking it (commit_version's two-phase claim):
    # replay ignores them, but they are debris — reclaim under the
    # same single-writer/grace contract as the data files
    log_dir = _log_path(table_dir)
    for f in sorted(os.listdir(log_dir)):
        if ".tmp-" in f:
            path = os.path.join(log_dir, f)
            if grace_seconds > 0 and os.path.getmtime(path) > cutoff:
                continue
            try:
                os.remove(path)
                gone.append(os.path.join(LOG_DIR, f))
            except OSError:
                pass
    return sorted(gone)


def zorder_snapshot(
    spark: SparkSession,
    table_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 4,
    bits: int = 16,
    stats_cols: list[str] | None = None,
) -> dict:
    """OPTIMIZE ZORDER over a snapshot-logged table — the layout
    half of Delta's ``OPTIMIZE ... ZORDER BY (a, b)`` built from this
    repo's own pieces: read the ACTIVE file set, range-partition by
    the Morton interleave of ``(col_a, col_b)`` (operators/zorder.py
    zvalue — a codegen'd bit expression, one shuffle), sort within
    partitions, land ``n_files`` new files, and swap them in as ONE
    atomic remove+add commit with their column envelopes recorded in
    the manifest.

    Why this pays at 100 TB: compaction fixes file SIZES, z-ordering
    fixes file CONTENTS — after the rewrite every participating
    column has locally-narrow [vmin, vmax] envelopes per file, so
    manifest pruning (and parquet row-group skipping inside the
    survivors) cuts scans filtered on EITHER dimension, where a
    one-column sort helps only that column.  Readers of the previous
    snapshot never tear: the new layout is invisible until the
    commit lands, and time travel keeps serving the old one.

    ``stats_cols`` defaults to ``[col_a, col_b]`` — the dimensions
    whose envelopes the layout just tightened are exactly the ones
    later prunes want in the manifest.

    Returns ``{"version", "n_rewritten", "adds"}``."""
    import shutil
    import uuid

    from .zorder import zvalue

    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    planned = plan_head(table_dir)
    active = snapshot_files(table_dir)
    if not active:
        raise ValueError(f"snapshot at {table_dir!r} has no active files")
    # read_snapshot applies the logged evolved schema when one exists,
    # so a layout rewrite never drops post-widening columns from
    # pre-widening files
    base = read_snapshot(spark, table_dir)
    tag = uuid.uuid4().hex[:8]
    staging = os.path.join(table_dir, f"_tmp_zorder_{tag}")
    (
        base.withColumn("_z", zvalue(col_a, col_b, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(staging)
    )
    adds = []
    for i, part in enumerate(
        sorted(p for p in os.listdir(staging) if p.endswith(".parquet"))
    ):
        name = f"zorder-{tag}-{i:05d}.parquet"
        os.rename(
            os.path.join(staging, part), os.path.join(table_dir, name)
        )
        adds.append(name)
    shutil.rmtree(staging, ignore_errors=True)
    # n_files above the populated z-range bins (or a fully-DV-deleted
    # table) stages empty parts — never commit them (NULL-stat files
    # defeat pruning forever)
    adds = _drop_empty_parts(table_dir, adds)
    # swap + stats inside the same rollback scope as compact/merge: a
    # failed commit unwinds the renamed files (log-driven readers
    # never saw them); hard crashes are vacuum_orphans territory
    try:
        version = commit_version(
            table_dir,
            adds=adds,
            removes=active,
            stats=stats_for_files(
                table_dir, adds, stats_cols or [col_a, col_b]
            ),
            # layout-only commit; reading through read_snapshot above
            # already applied any live deletion vectors, and removing
            # every active file retires them (snapshot_dvs prunes) —
            # z-order doubles as a full DV purge
            data_change=False,
            planned_version=planned,
        )
    except BaseException:
        for name in adds:
            try:
                os.remove(os.path.join(table_dir, name))
            except OSError:
                pass
        raise
    return {"version": version, "n_rewritten": len(active), "adds": adds}


def init_snapshot(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
    prefix: str = "init",
    bloom_key: str | None = None,
    bloom_bits: int | str | None = "auto",
) -> dict:
    """Bootstrap a snapshot-logged table from a DataFrame: write the
    data as parquet files, rename them to stable names, and commit
    version 1 with their column envelopes recorded (stats-in-manifest
    from the very first commit, so the first MERGE/DELETE already
    plans log-first).  Refuses a directory that already carries a
    log — bootstrap is not an upsert."""
    import shutil
    import uuid

    if log_versions(table_dir):
        raise ValueError(
            f"{table_dir!r} already has a snapshot log — use "
            "merge_into_snapshot/commit_version to change it"
        )
    os.makedirs(table_dir, exist_ok=True)
    tag = uuid.uuid4().hex[:8]
    staging = os.path.join(table_dir, f"_tmp_init_{tag}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    for i, part in enumerate(
        sorted(p for p in os.listdir(staging) if p.endswith(".parquet"))
    ):
        name = f"{prefix}-{tag}-{i:05d}.parquet"
        os.rename(
            os.path.join(staging, part), os.path.join(table_dir, name)
        )
        adds.append(name)
    shutil.rmtree(staging, ignore_errors=True)
    # empty parts defeat pruning forever (NULL-stat envelopes) —
    # drop them, EXCEPT when the whole bootstrap is empty: then one
    # 0-row part stays as the table's schema holder
    import pyarrow.parquet as _pq

    nonempty = [
        a
        for a in adds
        if _pq.ParquetFile(os.path.join(table_dir, a)).metadata.num_rows
        > 0
    ]
    if nonempty:
        for a in adds:
            if a not in set(nonempty):
                os.remove(os.path.join(table_dir, a))
        adds = nonempty
    elif len(adds) > 1:
        for a in adds[1:]:
            os.remove(os.path.join(table_dir, a))
        adds = adds[:1]
    try:
        cols = list(stats_cols or [])
        if bloom_key and bloom_key not in cols:
            cols.append(bloom_key)
        new_stats = (
            stats_for_files(table_dir, adds, cols) if cols else None
        )
        types = dict(df.dtypes)
        if bloom_key and new_stats:
            attach_key_blooms(
                spark,
                table_dir,
                adds,
                bloom_key,
                new_stats,
                bloom_bits,
                key_type=types.get(bloom_key),
            )
        # schema-in-the-log from commit 1 (r13 optimization, guide
        # §1.2/§6): the writer KNOWS df's schema, and recording it
        # makes every later read — summaries, DML rewrites, bloom
        # builds, time travel — an explicit-schema parquet scan
        # instead of a footer-inference pass (~80-115 ms of driver
        # work per un-schema'd read at local scale; at 100 TB the
        # inference job reopens footers the log already describes).
        version = commit_version(
            table_dir,
            adds=adds,
            stats=new_stats,
            schema=[[c, t] for c, t in df.dtypes],
        )
    except BaseException:
        for name in adds:
            try:
                os.remove(os.path.join(table_dir, name))
            except OSError:
                pass
        raise
    return {"version": version, "adds": adds}
