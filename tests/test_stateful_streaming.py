"""Custom stateful streaming: state survives across micro-batches."""

from __future__ import annotations

import json

import pytest

from survivor_processing_spark.streaming.stateful import (
    streaming_running_max,
    streaming_seen_filter,
)

SCHEMA = "key string, event_id bigint, ts bigint"


def _drop(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_available_now(stream_out, ckpt, sink: list, mode: str = "append"):
    q = (
        stream_out.writeStream.foreachBatch(
            lambda df, bid: sink.extend(df.collect())
        )
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_seen_filter_dedups_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    _drop(src, "b1.json", [
        {"key": "a", "event_id": 1, "ts": 10},
        {"key": "a", "event_id": 2, "ts": 11},
        {"key": "b", "event_id": 1, "ts": 12},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    sink: list = []
    _run_available_now(streaming_seen_filter(stream), ckpt, sink)
    assert {(r.key, r.event_id) for r in sink} == {("a", 1), ("a", 2), ("b", 1)}

    # second batch replays id 1 for key a (duplicate) + one new id
    sink.clear()
    _drop(src, "b2.json", [
        {"key": "a", "event_id": 1, "ts": 20},  # dup: must be dropped
        {"key": "a", "event_id": 3, "ts": 21},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    _run_available_now(streaming_seen_filter(stream), ckpt, sink)
    assert {(r.key, r.event_id) for r in sink} == {("a", 3)}


def test_running_max_carries_state(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    _drop(src, "b1.json", [
        {"key": "a", "event_id": 1, "ts": 100},
        {"key": "a", "event_id": 2, "ts": 300},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    sink: list = []
    _run_available_now(streaming_running_max(stream), ckpt, sink, mode="update")
    assert {(r.key, r.max_ts) for r in sink} == {("a", 300)}

    sink.clear()
    _drop(src, "b2.json", [{"key": "a", "event_id": 3, "ts": 200}])  # older
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    _run_available_now(streaming_running_max(stream), ckpt, sink, mode="update")
    assert {(r.key, r.max_ts) for r in sink} == {("a", 300)}  # kept the max
