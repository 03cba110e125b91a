"""A8: incremental file pickup — second run sees only new files."""

from __future__ import annotations

import json

from survivor_processing_spark.streaming.filesync import incremental_file_sync

SCHEMA = "doc_id bigint, text string"


def _write(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_incremental_file_sync_picks_up_only_new_files(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    seen: list[list[int]] = []

    def collect_batch(df, batch_id):
        seen.append([r.doc_id for r in df.select("doc_id").collect()])

    _write(src, "a.json", [{"doc_id": 1, "text": "one"}, {"doc_id": 2, "text": "two"}])
    incremental_file_sync(spark, str(src), ckpt, SCHEMA, collect_batch)
    assert sorted(x for b in seen for x in b) == [1, 2]

    seen.clear()
    _write(src, "b.json", [{"doc_id": 3, "text": "three"}])
    incremental_file_sync(spark, str(src), ckpt, SCHEMA, collect_batch)
    assert sorted(x for b in seen for x in b) == [3]  # a.json NOT reprocessed

    seen.clear()
    incremental_file_sync(spark, str(src), ckpt, SCHEMA, collect_batch)
    assert seen == [] or all(not b for b in seen)  # nothing new
