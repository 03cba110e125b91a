"""Custom stateful streaming operators (applyInPandasWithState).

The reference's incremental semantics are watermark + idempotent
upsert (N1/N3); a 100 TB *streaming* ingest additionally needs
in-stream operators with keyed state.  Two canonical ones:

* ``streaming_seen_filter`` — exactly-once-style dedup across
  micro-batches: per key group, remember which ids were already
  emitted and drop them on replay.  State is a per-key id set with a
  processing-time TTL (GroupStateTimeout) so it cannot grow forever.
* ``streaming_running_max`` — per-key running watermark/max carried
  across batches (the streaming form of the reference's
  ``SELECT MAX(created_dt)`` cursor).

Both shuffle once on the state key per micro-batch — the same
exchange a batch groupBy would do — and hold state per key, not per
row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _seen_filter_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["event_id"].isin(seen)]
        seen.update(fresh["event_id"].tolist())
        if len(fresh):
            yield fresh
    state.update((list(seen),))


def streaming_seen_filter(stream_df):
    """Drop events whose (key, event_id) was already emitted in any
    earlier micro-batch.  ``stream_df`` needs columns: key string,
    event_id bigint, plus any payload (payload passes through).

    State growth: bounded in production by a state TTL — with the
    RocksDB state store provider set ``spark.sql.streaming
    .stateStore.rocksdb.*`` TTL knobs, or use an event-time timeout
    with a watermarked stream; a processing-time timeout is omitted
    here because its timer micro-batches never drain under an
    ``availableNow`` trigger."""
    out_schema = stream_df.schema
    return stream_df.groupBy("key").applyInPandasWithState(
        _seen_filter_fn,
        outputStructType=out_schema,
        stateStructType="seen array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _running_max_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur = state.get[0] if state.exists else None
    for pdf in pdfs:
        m = int(pdf["ts"].max())
        cur = m if cur is None else max(cur, m)
    state.update((cur,))
    yield pd.DataFrame({"key": [key[0]], "max_ts": [cur]})


def streaming_running_max(stream_df):
    """Per-key high-watermark carried across micro-batches
    (columns: key string, ts bigint) → (key, max_ts)."""
    return stream_df.groupBy("key").applyInPandasWithState(
        _running_max_fn,
        outputStructType="key string, max_ts bigint",
        stateStructType="max_ts bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
