"""Shared gate-query lifecycle helpers: every query that stages temp
state (parquet fixtures, streaming memory sinks) must detach its
result from that state before returning, or repeated runs (driver
rounds, bench reps) leak disk and driver memory for the session's
lifetime."""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame


def detach_and_cleanup(df: DataFrame, *paths: str) -> DataFrame:
    """Materialize ``df`` off its backing files (localCheckpoint pins
    the rows in block-manager storage), then delete the temp dirs —
    the caller's DataFrame stays valid after cleanup.  On a cluster
    the equivalent is ``checkpoint()`` to fault-tolerant storage."""
    out = df.localCheckpoint(eager=True)
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return out


def detach_sink(df: DataFrame, sink: str, *paths: str) -> DataFrame:
    """Memory-sink variant: checkpoint the projection, DROP the
    sink's temp view (each streaming gate registers a fresh
    uuid-named sink — without the drop every run pins its complete
    result set in driver memory and the catalog forever), and remove
    any staged source/checkpoint dirs."""
    out = df.localCheckpoint(eager=True)
    df.sparkSession.catalog.dropTempView(sink)
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return out
