"""Small-files compaction planning — the lakehouse maintenance pass
a 100 TB table needs continuously (Delta OPTIMIZE / Iceberg
rewriteDataFiles are the public analogs; the reference stages
per-episode files with no compaction story at all, so this is
beyond-reference surface like the rest of the scale stack).

Shape: the planner runs over the FILE MANIFEST (one row per file —
metadata-scale even for a 100 TB table), never the data.  Within
each table partition it orders files largest-first (deterministic
(size DESC, id ASC) — the classic sorted-packing heuristic) and
cuts output bins at running-sum multiples of the target size:

    bin = (running_sum_before_this_file) div target

One window per partition key, fully parallel across partitions, no
shuffle beyond the window's partitioning; the rewrite itself is then
a repartition-by-(partition, bin) write, the exact layout move
``export_balanced_shards`` (queries/corpus.py) already exercises
end-to-end.  A file larger than the target spans bins' boundaries
and simply anchors its own mostly-full bin — the standard OPTIMIZE
behavior (bins are a lower bound of target size except the last per
partition).

Everything is exact integer arithmetic (`div` truncation on
non-negative running sums == floor division in DuckDB's ``//``), so
the plan is engine-portable and oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def compaction_plan(
    files: DataFrame,
    size_col: str,
    id_col: str,
    target_bytes: int,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign every file a ``bin`` (int64) within its partition such
    that consecutive bins pack files to ~``target_bytes``.

    Ordering inside a partition is (size DESC, id ASC) — largest
    files first so big files anchor bins instead of fragmenting the
    tail, ties broken by id for a deterministic, replayable plan.
    NULL-sized manifest rows are quarantined (a NULL size would
    NULL-poison every later cumulative sum in its partition).
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.partitionBy(*[F.col(c) for c in part_cols])
        .orderBy(F.col(size_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(size_col).cast("long")).over(w) - F.col(
        size_col
    ).cast("long")
    # `div` is Spark's exact integral division (truncation == floor on
    # the non-negative running sum, same as DuckDB's `//`) — a float
    # `/` + cast could round an exact bin boundary across it
    return (
        files.where(F.col(size_col).isNotNull())
        .withColumn("_cum_before", cum_before)
        .withColumn("bin", F.expr(f"_cum_before div {int(target_bytes)}L"))
        .drop("_cum_before")
    )


def compaction_summary(plan: DataFrame, size_col: str, part_cols: Sequence[str]) -> DataFrame:
    """Per-bin rollup of a :func:`compaction_plan` output: how many
    files merge into each target file and the bytes it will hold —
    the numbers an OPTIMIZE job reports."""
    return plan.groupBy(*[F.col(c) for c in part_cols], "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.col(size_col).cast("long")).alias("total_bytes"),
        F.max(F.col(size_col).cast("long")).alias("max_file_bytes"),
    )
