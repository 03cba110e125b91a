"""Embedding similarity search.

Brute-force cosine top-k is the correctness baseline; the scale path
is LSH bucketing by random-hyperplane signs (deterministic
hash-derived hyperplanes, so no driver-side randomness and replays
are stable).  Dot products run as built-in array expressions
(zip_with + aggregate) over double-cast floats — JVM-side, no UDF.

At 100 TB: the query vector (or a small query *set*) broadcasts; the
corpus never shuffles for brute force (map-side score + top-k via
partial sort).  The LSH variant shuffles once on the bucket key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, cast(0.0 as double),"
            f" (acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )


def cosine_expr(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine against one literal query vector.  The query
    is a literal in the plan (broadcast by construction); scoring is
    a map-side projection; the only ordering work is a global top-k
    (TakeOrderedAndProject), not a full sort."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
    ).withColumn("_q", qlit)
    scored = scored.select(
        id_col,
        cosine_expr("_v", "_q").alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("sim_rank", id_col)
    )


def all_pairs_above(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine >=
    threshold).  Brute-force self-join — correct at any scale but
    O(n²); use ``lsh_pairs_above`` when n is large."""
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine_expr("v1", "v2"))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2")
    )


def hyperplane_signature_expr(vec_col: str, n_planes: int, dim: int):
    """Deterministic random-hyperplane LSH signature (int bucket).

    Hyperplane h[p][i] = ±1 chosen by bit p of xxhash64(i) — a fixed,
    reproducible pseudo-random sign matrix computed inline; the sign
    of <v, h[p]> is bit p of the bucket key.  Replays are stable
    across sessions and cluster sizes."""
    return F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), cast(0 as int), (acc, p) -> acc + "
        f" if(aggregate(zip_with({vec_col}, sequence(0, {dim - 1}),"
        f"      (x, i) -> cast(x as double) * if(bit_get(xxhash64(i), p) = 1, 1.0, -1.0)),"
        f"     cast(0.0 as double), (a2, v) -> a2 + v) > 0,"
        f"    cast(shiftleft(1, p) as int), 0))"
    )


def lsh_pairs_above(
    emb: DataFrame,
    threshold: float,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: bucket by hyperplane-sign
    signature in ``n_tables`` independent tables (plane p of table t
    uses hash seed t*n_planes+p), join within buckets, verify with
    exact cosine.  Recall grows with tables; candidates stay tiny
    versus n²."""
    base = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    sigs = base.select(
        "doc_id",
        "v",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_tables - 1}), t -> "
                f" aggregate(sequence(0, {n_planes - 1}), cast(0 as int), (acc, p) -> acc + "
                f"  if(aggregate(zip_with(v, sequence(0, {dim - 1}),"
                f"       (x, i) -> cast(x as double)"
                f"            * if(bit_get(xxhash64(i, t * {n_planes} + p), 0) = 1, 1.0, -1.0)),"
                f"      cast(0.0 as double), (a2, w) -> a2 + w) > 0,"
                f"     cast(shiftleft(1, p) as int), 0)))"
            )
        ).alias("table_idx", "bucket"),
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.v").alias("v1"),
            F.col("b.v").alias("v2"),
        )
        .distinct()
    )
    return (
        cands.withColumn("cosine", cosine_expr("v1", "v2"))
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2")
    )
