"""Incremental file discovery (SURVEY.md §2 A8/N5).

The reference re-downloads Drive files whose ``modifiedDate`` beats
the local mtime (reference confessional_extract.py:133-193).  The
Spark-native analog is Auto-Loader-style incremental listing: a file
*stream* with an ``availableNow`` trigger — the checkpoint records
which files were already processed, so each run picks up only new
arrivals, and ``foreachBatch`` hands them to any batch sink (e.g.
the MERGE upsert).  No mtime bookkeeping in user code; replays are
exactly-once-effect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def incremental_file_sync(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    schema: str,
    batch_fn: Callable[[DataFrame, int], None],
    fmt: str = "json",
) -> None:
    """Process files added to ``src_dir`` since the last run.

    One ``availableNow`` micro-batch run: discovers files not yet in
    the checkpoint's file index, applies ``batch_fn(batch_df,
    batch_id)``, commits, stops.  Calling it again later processes
    only newer files — the reference's modified-since pickup without
    a mtime column."""
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .load(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
