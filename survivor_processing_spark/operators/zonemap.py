"""Manifest-level zone maps + file skipping — the data-skipping
layer a lakehouse table format (Delta/Iceberg file stats, Hive-style
min/max manifests) provides, built directly on parquet footer
statistics since those packages aren't installable here.  Partner of
the compaction planner (operators/compaction.py): compaction decides
the file LAYOUT, the zone map makes the layout PAY — a range
predicate on a range-partitioned or z-ordered table touches the
files whose [min, max] envelope intersects it and skips the rest
WITHOUT opening them.

Why this matters at 100 TB even though Spark already does row-group
skipping: Spark's parquet pushdown prunes INSIDE files it has
already scheduled — the driver still lists, plans, and launches a
task per file.  A manifest prunes the FILE LIST before planning, so
a day's query on a year's table schedules 1/365th of the tasks.
That pre-plan pruning is exactly what table-format manifests exist
for; this operator keeps the manifest as a (tiny, file-count-sized)
DataFrame any query can join or filter.

Mechanics: the builder reads ONLY parquet footers (pyarrow, no data
pages) — cost is one footer per file, manifest size is
files × columns rows.  Column min/max are kept as STRINGS exactly
as typed values print (bit-faithful for ints/strings; fine for the
pruning use because the PRUNE comparisons happen after casting back
to the queried column's type).  The generated DuckDB oracle rebuilds
the same manifest from ``parquet_metadata()`` — a true cross-engine
check that our footer walk agrees with an independent reader.

Correctness contract (tested, not asserted): for any range
predicate, scanning the pruned file subset ≡ scanning every file
with the predicate — zone-map pruning may only skip files the
predicate provably cannot match (NULL-stat files are never skipped).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _list_parquet(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def build_zonemap(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One manifest row per (file, column): ``file, col, n_rows,
    vmin, vmax`` with min/max as strings (NULL when the footer
    carries no stats).  Footer-only reads; file-count-sized output.

    On a real cluster with millions of files, run this builder AS a
    Spark job over the file list (mapInPandas over a file-name
    DataFrame — same pyarrow call per task); here the driver-side
    loop is file-count-bounded by construction and keeps the module
    dependency-light."""
    import pyarrow.parquet as pq

    rows = []
    for f in _list_parquet(path):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            if c not in names:
                raise ValueError(f"column {c!r} not in {f}")
            vmin: str | None = None
            vmax: str | None = None
            n = 0
            ok = True
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(names[c])
                n += col.num_values
                st = col.statistics
                if st is None or not st.has_min_max:
                    ok = False
                    continue
                mn, mx = str(st.min), str(st.max)
                vmin = mn if vmin is None or _lt(mn, vmin) else vmin
                vmax = mx if vmax is None or _lt(vmax, mx) else vmax
            if not ok:
                vmin = vmax = None  # partial stats: never prune on them
            rows.append((os.path.basename(f), c, n, vmin, vmax))
    return spark.createDataFrame(
        rows, "file string, col string, n_rows long, vmin string, vmax string"
    )


def _lt(a: str, b: str) -> bool:
    """Numeric-aware string compare for footer stats (ints/floats
    compare numerically, everything else bytewise)."""
    try:
        return float(a) < float(b)
    except ValueError:
        return a < b


def prune_files(
    zonemap: DataFrame, col: str, lo, hi, cast: str = "bigint"
) -> list[str]:
    """Files whose [vmin, vmax] envelope intersects [lo, hi] on
    ``col`` (cast to ``cast`` for the comparison), plus every file
    with NULL stats (never skip blind).  Manifest-sized collect."""
    zm = zonemap.filter(F.col("col") == col)
    keep = zm.filter(
        F.col("vmin").isNull()
        | (
            (F.expr(f"cast(vmin as {cast})") <= F.lit(hi))
            & (F.expr(f"cast(vmax as {cast})") >= F.lit(lo))
        )
    )
    return sorted(r["file"] for r in keep.select("file").collect())


def pruned_scan(
    spark: SparkSession,
    path: str,
    zonemap: DataFrame,
    col: str,
    lo,
    hi,
    cast: str = "bigint",
) -> DataFrame:
    """Range scan that schedules ONLY the surviving files, then
    applies the exact predicate (zone maps over-approximate; the
    filter is still required and still pushes down within files)."""
    names = set(prune_files(zonemap, col, lo, hi, cast))
    files = [
        f for f in _list_parquet(path) if os.path.basename(f) in names
    ]
    if not files:
        return (
            spark.read.parquet(path)
            .filter(F.lit(False))
        )
    return (
        spark.read.parquet(*files)
        .filter(
            (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        )
    )


def zonemap_oracle(path: str, cols: list[str]) -> str:
    """DuckDB SQL rebuilding :func:`build_zonemap` from
    ``parquet_metadata()`` — an independent footer reader agreeing
    with the pyarrow walk.  (DuckDB prints timestamp stats with a
    time part; the builder's str() does too, so the strings match
    for int/string/timestamp columns.)"""
    in_list = ", ".join(f"'{c}'" for c in cols)
    glob = path if path.endswith(".parquet") else f"{path}/*.parquet"
    # the builder's _lt orders numerically when the stats parse as
    # numbers, bytewise otherwise — replay that: a column's stats are
    # homogeneous (one physical type), so the branch is per-column
    return f"""SELECT regexp_extract(file_name, '[^/]+$') AS file,
       path_in_schema AS col,
       CAST(SUM(num_values) AS BIGINT) AS n_rows,
       CASE WHEN COUNT(*) <> COUNT(stats_min_value) THEN NULL
            WHEN COUNT(*) = COUNT(TRY_CAST(stats_min_value AS DOUBLE))
            THEN ARG_MIN(stats_min_value,
                         TRY_CAST(stats_min_value AS DOUBLE))
            ELSE MIN(stats_min_value) END AS vmin,
       CASE WHEN COUNT(*) <> COUNT(stats_max_value) THEN NULL
            WHEN COUNT(*) = COUNT(TRY_CAST(stats_max_value AS DOUBLE))
            THEN ARG_MAX(stats_max_value,
                         TRY_CAST(stats_max_value AS DOUBLE))
            ELSE MAX(stats_max_value) END AS vmax
FROM parquet_metadata('{glob}')
WHERE path_in_schema IN ({in_list})
GROUP BY file_name, path_in_schema"""
