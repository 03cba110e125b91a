"""Driver-local rows → JVM ``LocalRelation`` DataFrames.

``spark.createDataFrame(rows, schema)`` over a plain Python list
parallelizes it into ``defaultParallelism`` Python-RDD slices: every
job that touches the result (a broadcast-exchange build, a collect)
must round-trip a Python worker PER SLICE — measured 0.5 s per
broadcast build of a 5-row manifest table at ``local[32]``, and 5.7 s
when such a DataFrame was coalesce(1)'d (one task evaluating all 32
Python partitions sequentially).  Routing the same rows through a
pandas DataFrame + the Arrow conversion path yields a pure-JVM
``LocalRelation``: no Python workers, no job at all for broadcast
builds, ~0.07 s end to end.

Use for the manifest-sized local tables the snapshot/merge stack
builds constantly (zone-map rows, bloom rows, compaction manifests,
seed vectors, small dimension literals) — anything driver-local and
bounded.  NOT for data that should be distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _ddl_names(schema: str) -> list[str]:
    """Column names from a DDL schema string, splitting on top-level
    commas only (``decimal(18,2)``, ``array<...>``, ``struct<a:int,
    b:int>`` carry nested commas)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(schema[start:i])
            start = i + 1
    names.append(schema[start:])
    return [f.strip().split()[0].strip("`") for f in names if f.strip()]


def local_rows_df(
    spark: SparkSession, rows: list, schema: str
) -> DataFrame:
    """A DataFrame over driver-local ``rows`` that plans as a JVM
    ``LocalRelation`` (see module doc).  ``schema`` is the same DDL
    string ``createDataFrame`` takes; ``rows`` are positional tuples
    (or anything ``pd.DataFrame.from_records`` accepts)."""
    import pandas as pd

    pdf = pd.DataFrame.from_records(
        list(rows), columns=_ddl_names(schema)
    )
    return spark.createDataFrame(pdf, schema=schema)
