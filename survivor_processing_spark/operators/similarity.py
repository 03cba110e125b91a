"""Embedding similarity search.

Brute-force cosine top-k is the correctness baseline; the scale path
is LSH bucketing by random-hyperplane signs (deterministic
hash-derived hyperplanes, so no driver-side randomness and replays
are stable).

Compute placement: a single-query dot product runs as a built-in
array expression (JVM-side, cheap in absolute terms); *pairwise*
work (all-pairs, bucket verification) runs as dense unit-normalized
matmuls inside ``applyInPandas`` groups — a block or posting list is
the unit of work, so the n²·d flops happen in numpy kernels instead
of per-pair rows (measured ~40x over a join + scalar-UDF pipeline).

At 100 TB: the query vector (or a small query *set*) broadcasts; the
corpus never shuffles for brute force (map-side score + top-k via
partial sort).  The LSH variant shuffles once on the bucket key; the
block grid shuffles n·B vector rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf

from ..functions.sql_literals import sql_int_array


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
    # orderBy+limit compiles to TakeOrderedAndProject: each partition
    # keeps its local top-k, the driver merges k*partitions rows — no
    # global sort, no single-partition window over the corpus.  The
    # rank window then runs over just k rows.
    topk = scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return topk.withColumn("sim_rank", F.row_number().over(w)).select(
        "sim_rank", id_col
    )


def _group_pairs_kernel(threshold: float, n_blocks: int | None = None):
    """applyInPandas kernel: all (id1 < id2, cosine >= threshold)
    pairs WITHIN one group, as one unit-normalized matmul.

    The group is the unit of pairwise work: a matmul over a
    few-hundred-row block is ~10^6 flops — numpy does that in
    microseconds, where a per-pair row pipeline (join + scalar UDF)
    pays Python/serialization cost per pair (measured ~40x slower at
    2k vectors).  With ``n_blocks``, the group is one cell of a
    block-pair grid keyed ``_g = p*B+q`` (p <= q): diagonal cells
    emit triangular pairs, off-diagonal cells only cross pairs — each
    global pair lands in exactly one cell.  (p, q) come from the
    group KEY, never from the rows present: an empty block must not
    collapse a cross cell into a diagonal one."""

    def fn(pdf):
        import numpy as np
        import pandas as pd

        # object dtype: Arrow casts an EMPTY column to any declared
        # output type, so the kernel stays id-dtype-agnostic (the
        # declared applyInPandas schema is derived from the id column)
        empty = pd.DataFrame({"id1": pd.Series([], dtype="object"),
                              "id2": pd.Series([], dtype="object")})
        if len(pdf) < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        M = np.stack(pdf["_v"].to_numpy()).astype("float64")
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        if n_blocks is not None:
            p, q = divmod(int(pdf["_g"].iloc[0]), n_blocks)
            if p != q:  # cross cell: only (block p) x (block q)
                blocks = pdf["_b"].to_numpy()
                am, bm = blocks == p, blocks == q
                if not am.any() or not bm.any():
                    return empty
                S = M[am] @ M[bm].T
                i, j = np.nonzero(S >= threshold)
                a, b = ids[am][i], ids[bm][j]
                return pd.DataFrame(
                    {"id1": np.minimum(a, b), "id2": np.maximum(a, b)}
                )
        S = M @ M.T
        i, j = np.triu_indices(len(pdf), 1)
        keep = S[i, j] >= threshold
        a, b = ids[i[keep]], ids[j[keep]]
        return pd.DataFrame({"id1": np.minimum(a, b), "id2": np.maximum(a, b)})

    return fn


def all_pairs_above(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine >=
    threshold).  Exact all-pairs, organized as a block-pair grid:
    hash every vector into one of ``n_blocks`` blocks, replicate each
    row to the ``n_blocks`` block-pair groups it participates in, and
    run the matmul kernel per group.  Work is O(n²·d) flops — that is
    what *exact* costs — but spent inside dense numpy matmuls instead
    of per-pair rows.

    Scale: shuffle volume is n·B vector rows (replication factor B),
    and each group holds ~2n/B rows — choose B ~ n·d·8 / executor
    budget so a group's matrix fits memory; use ``lsh_pairs_above``
    when n² itself is unaffordable."""
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_b"),
    )
    # group id for block-pair (p<=q): p*B+q; each row joins groups
    # (min(b,x), max(b,x)) for every x — array_distinct collapses the
    # self-pair duplicate.
    grid = F.array_distinct(
        F.expr(
            f"transform(sequence(0, {n_blocks - 1}),"
            f" x -> least(_b, x) * {n_blocks} + greatest(_b, x))"
        )
    )
    reps = base.select("_id", "_v", "_b", F.explode(grid).alias("_g"))
    id_dt = emb.schema[id_col].dataType.simpleString()
    return reps.groupBy("_g").applyInPandas(
        _group_pairs_kernel(threshold, n_blocks=n_blocks),
        f"id1 {id_dt}, id2 {id_dt}",
    )


def build_ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: deterministic seed pick + k-means
    refinement, then assign every vector to its nearest centroid
    (the "inverted list" id).

    Returns ``(centroids, assigned)`` where ``centroids`` is a list of
    ``(centroid_id, numpy_vector)`` (small — O(K·d), lives with the
    plan like any literal) and ``assigned`` is the corpus DataFrame
    plus a ``cluster_id`` column.

    Determinism / scale notes:
    - Seeds are the ``n_centroids`` vectors with the smallest
      ``xxhash64(id)`` — a reproducible pseudo-random sample
      (TakeOrdered, no global sort), so replays and resumes are
      stable across cluster sizes.
    - Each k-means iteration is one map-side assignment (centroid
      matrix is a closure constant → broadcast by construction,
      argmax is a numpy matmul per Arrow batch) + one groupBy mean
      over exploded components: shuffle rows = n·d scalars, the same
      shape MinHash signatures use, all partial-aggregated map-side.
    - At 100 TB you refine on a hash-sample (filter
      ``pmod(xxhash64(id), m) = 0``) and assign the full corpus once;
      assignment itself never shuffles.
    """
    import numpy as np

    # NULL-vector hygiene: a NULL embedding among the xxhash64-ranked
    # seeds would fail np.asarray driver-side (same class as the
    # portable-seed fixes)
    base = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    seeds = (
        base.select("_v", F.xxhash64("_id").alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    cent = np.stack([np.asarray(r["_v"], dtype="float64") for r in seeds])
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)

    def assign_udf(cent_mat):
        unit = cent_mat / np.linalg.norm(cent_mat, axis=1, keepdims=True)

        def fn(v):
            import pandas as pd

            m = np.stack(v.to_numpy()).astype("float64")
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(m @ unit.T, axis=1).astype("int32"))

        return pandas_udf(fn, "int")

    for _ in range(refine_iters):
        assigned = base.withColumn("cluster_id", assign_udf(cent)(F.col("_v")))
        means = (
            assigned.select(
                "cluster_id", F.posexplode("_v").alias("_i", "_x")
            )
            .groupBy("cluster_id", "_i")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        new_cent = cent.copy()
        by_cluster: dict[int, list] = {}
        for r in means:
            by_cluster.setdefault(r["cluster_id"], []).append((r["_i"], r["_m"]))
        for cid, comps in by_cluster.items():
            vec = np.zeros(cent.shape[1])
            for i, m in comps:
                vec[i] = m
            n = np.linalg.norm(vec)
            if n > 0:
                new_cent[cid] = vec / n
        cent = new_cent

    assigned = emb.where(F.col(vec_col).isNotNull()).withColumn(
        "cluster_id", assign_udf(cent)(F.col(vec_col))
    )
    return [(i, cent[i]) for i in range(len(cent))], assigned


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the ``n_probe`` inverted
    lists whose centroids are nearest the query, brute-force only
    inside them.  Scanned fraction ~ n_probe/n_centroids of the
    corpus; recall depends on how well the quantizer separates the
    query's true neighbors (n_probe = n_centroids degrades to exact).

    The cluster filter arrives as an ``isin`` literal predicate —
    Catalyst pushes it into the scan of a materialized (partitioned)
    index, so at rest the unprobed lists are never read."""
    import numpy as np

    cents, assigned = build_ivf_index(
        emb, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    q = np.asarray(query_vec, dtype="float64")
    q /= np.linalg.norm(q)
    order = np.argsort([-float(np.dot(q, c)) for _, c in cents])
    probe = [int(cents[i][0]) for i in order[:n_probe]]
    cands = assigned.filter(F.col("cluster_id").isin(probe)).drop("cluster_id")
    return brute_force_topk(
        cands, [float(x) for x in query_vec], k=k, id_col=id_col, vec_col=vec_col
    )


def ivf_recall_bound(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    min_recall: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF accuracy CONTRACT as a checkable one-row output: run
    the approximate IVF top-k AND the exact brute-force top-k in the
    same pipeline, semi-join the id sets, and emit
    ``(k, n_matches >= ceil(min_recall * k))`` — the same
    error-bound-gating technique that made the sketch row hash-green
    in r6 (an oracle asserts the boolean TRUE; ANN result SETS are
    never bit-comparable across engines, their recall floor is).

    Both arms share the corpus scan; the join is k-vs-k row counts —
    driver-free, output-bounded.  Intended as the r7 gating query for
    the ivf_topk family (ROTATION_r06.md)."""
    import math

    approx = ivf_topk(
        emb,
        query_vec,
        k=k,
        n_centroids=n_centroids,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col(id_col))
    exact = brute_force_topk(
        emb, query_vec, k=k, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col))
    matches = approx.join(exact, id_col, "left_semi")
    need = math.ceil(min_recall * k)
    return matches.agg(
        F.lit(k).alias("k"),
        (F.count(F.lit(1)) >= F.lit(need)).alias("recall_above_floor"),
    )


def lsh_portable_pairs(
    emb: DataFrame,
    threshold: float,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """ENGINE-PORTABLE hyperplane LSH: same banding scheme as
    :func:`lsh_pairs_above`, but every piece of the signature is
    bit-reproducible across engines so a DuckDB oracle can replay it
    for a full value-hash gate:

    - plane signs come from md5 of the STRING ``"{component}_{seed}"``
      (seed = table*n_planes+plane) — parity of a 60-bit md5-hex
      prefix, not Spark-private xxhash64;
    - projections are INTEGER-LANE: each component is scaled
      ``floor(x*1e6+0.5)`` to an int64 before the ±1 sum, so the
      bucket decision (``proj > 0``) is exact integer arithmetic with
      no summation-order sensitivity (the float-sum variant can flip
      a sign on a projection within an ulp of zero);
    - the verify is the exact cosine at ``threshold``, the same
      comparison the hash-green exact all-pairs query already pins
      cross-engine on this corpus.

    The xxhash64 float-lane variant stays the scale default (one
    hash op per element vs an md5 + hex parse per (element, plane));
    this variant exists to hash-gate the LSH machinery itself.

    ``max_bucket`` is the PORTABLE hot-bucket cap: within each
    (table, bucket) posting list only the ``max_bucket`` vectors with
    the smallest md5(id) survive — a deterministic, engine-replayable
    truncation, so the oracle stays hash-exact while the candidate
    count is bounded by tables x buckets x max_bucket^2 instead of
    sum-of-m^2 (the uncapped 4-bit config is quadratic within bucket:
    131 s at sf1, the one scale-killer VERDICT r05 flagged).  At
    gate scale (sf0.01) typical posting lists sit under the cap, so
    the capped output is identical to the exact-replay one."""
    import hashlib

    comps = emb.select(
        F.col(id_col).alias("doc_id"), F.posexplode_outer(vec_col).alias("_i", "_x")
    ).select(
        "doc_id",
        "_i",
        F.floor(F.col("_x").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("_q"),
    )

    def sign_value(i: int, seed: int) -> int:
        # the signature DEFINITION: parity of the 60-bit md5-hex
        # prefix of "{component}_{seed}".  Signs depend only on
        # (i, seed), so they constant-fold here via hashlib (the
        # same md5 the oracle computes in SQL) instead of running
        # an md5 + hex-parse per (row, lane) on the cluster — that
        # per-row variant measured 64 md5s/component-row, minutes
        # at ~sf1; this one is a 64-int literal lookup per lane.
        h = int(hashlib.md5(f"{i}_{seed}".encode()).hexdigest()[:15], 16)
        return 1 if h & 1 else -1

    # dimension probe: first NON-NULL vector (a NULL first row would
    # TypeError at build time; NULL vectors are quarantined by the
    # posexplode_outer path like everywhere else in the pipeline)
    first = emb.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:  # empty input: the correct output is no pairs
        return emb.sparkSession.createDataFrame(
            [], f"id1 {emb.schema[id_col].dataType.simpleString()},"
                f" id2 {emb.schema[id_col].dataType.simpleString()}"
        )
    dim = len(first[0])

    def sign_arr(seed: int) -> str:
        # ONE parsed SQL literal per seed, not dim F.lit() py4j round
        # trips — n_tables*n_planes*dim lit() calls (4096 at the
        # gating config) cost ~2 s of driver time per build and made
        # the query FLAT across 10x data (fixed-cost-bound); a parsed
        # array literal is ~ms (the bloom lesson, SCALE.md r5)
        return sql_int_array(sign_value(i, seed) for i in range(dim))

    proj_aggs = [
        F.expr(
            f"sum(_q * element_at({sign_arr(t * n_planes + p)},"
            " cast(_i + 1 as int)))"
        ).alias(f"_s_{t}_{p}")
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    projs = comps.groupBy("doc_id").agg(*proj_aggs)
    bucket_exprs = [
        sum(
            (F.when(F.col(f"_s_{t}_{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0)))
            for p in range(n_planes)
        ).alias(f"_b{t}")
        for t in range(n_tables)
    ]
    buckets = projs.select("doc_id", *bucket_exprs)
    sigs = buckets.select(
        "doc_id",
        F.posexplode_outer(F.array(*[f"_b{t}" for t in range(n_tables)])).alias(
            "table_idx", "bucket"
        ),
    )
    # candidate pairs via SELF-JOIN on the bucket key (4-bit buckets
    # have only 16 values per table — hot by construction, so a
    # per-bucket pair array would materialize O(m²) structs in one
    # row; the join streams them and AQE splits skewed keys).  The
    # signature table is one tiny row per vector — cache it (bounded:
    # one live copy per call site) so the projection pipeline runs
    # once, not once per join branch.
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("table_idx", "bucket").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        sigs = (
            sigs.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_bucket)
            .drop("_r")
        )
    from .dedup import cache_bounded

    sigs = cache_bounded("lsh_portable_sigs", sigs)
    cands = (
        sigs.select("table_idx", "bucket", F.col("doc_id").alias("id1"))
        .join(
            sigs.select("table_idx", "bucket", F.col("doc_id").alias("id2")),
            ["table_idx", "bucket"],
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    # Verify: norms are per-VECTOR values, so compute each side's
    # norm once in the join projection instead of twice per candidate
    # pair (a vector in m postings pays the interpreted 64-element
    # aggregate once, not m times).  Bit-identical to cosine_expr:
    # the same _norm tree evaluates over the same array, and the
    # division keeps the dot/(n1*n2) association.
    e1 = emb.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("_v1"),
        _norm(vec_col).alias("_n1"),
    )
    e2 = emb.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("_v2"),
        _norm(vec_col).alias("_n2"),
    )
    return (
        cands.join(e1, "id1")
        .join(e2, "id2")
        .filter(
            _dot("_v1", "_v2") / (F.col("_n1") * F.col("_n2")) >= threshold
        )
        .select("id1", "id2")
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
    # Signature via codegen'd flat aggregates (same shape as MinHash):
    # explode the vector to (doc_id, i, x) and compute one
    # sum(x * sign(i, table, plane)) per (table, plane) — signs are
    # bit 0 of xxhash64(i, seed), a fixed pseudo-random ±1 matrix.
    # Higher-order-function nesting here was interpreted per element
    # (~30x slower measured); flat sums stay in whole-stage codegen
    # and partial-aggregate map-side.
    comps = base.select(
        "doc_id", F.posexplode_outer("v").alias("_i", "_x")
    ).select("doc_id", "_i", F.col("_x").cast("double").alias("_x"))
    proj_aggs = [
        F.sum(
            F.col("_x")
            * F.when(
                F.expr(f"bit_get(xxhash64(_i, {t * n_planes + p}), 0) = 1"), 1.0
            ).otherwise(-1.0)
        ).alias(f"_s_{t}_{p}")
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    projs = comps.groupBy("doc_id").agg(*proj_aggs)
    bucket_exprs = [
        sum(
            (F.when(F.col(f"_s_{t}_{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0)))
            for p in range(n_planes)
        ).alias(f"_b{t}")
        for t in range(n_tables)
    ]
    buckets = projs.select("doc_id", *bucket_exprs)
    sigs = buckets.select(
        "doc_id",
        F.posexplode_outer(F.array(*[f"_b{t}" for t in range(n_tables)])).alias(
            "table_idx", "bucket"
        ),
    )
    # Verify inside each (table, bucket) posting with the dense matmul
    # kernel — no self-join (which would run the signature pipeline
    # once per branch), no candidate-pair materialization, no per-pair
    # UDF rows.  Vectors re-attach with ONE hash join on doc_id
    # (signature rows are tiny; the vector payload replicates
    # n_tables-fold into the group shuffle — bounded and uniform).  A
    # pair co-bucketed in several tables is re-verified per table
    # (microseconds of matmul) and collapsed by the final distinct on
    # the int pair."""
    with_v = sigs.join(
        base.select(F.col("doc_id"), F.col("v").alias("_v")), "doc_id"
    ).select(F.col("doc_id").alias("_id"), "_v", "table_idx", "bucket")
    id_dt = emb.schema[id_col].dataType.simpleString()
    return (
        with_v.groupBy("table_idx", "bucket")
        .applyInPandas(_group_pairs_kernel(threshold), f"id1 {id_dt}, id2 {id_dt}")
        .distinct()
    )


def semantic_dedup_portable(
    emb: DataFrame,
    k: int = 8,
    threshold_num: int = 81,
    threshold_den: int = 100,
    scale: int = 1000,
    max_cluster: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ENGINE-PORTABLE SemDeDup-style semantic deduplication
    (Abbas et al. 2023, "SemDeDup", arXiv:2303.09540 — public
    method): coarse-cluster the embedding space, then drop any
    vector whose cosine similarity to a lower-ranked member of the
    SAME cluster clears a threshold — the standard way a training
    pipeline removes semantically redundant documents that no
    lexical dedup (MinHash/SimHash) can see.

    Every step is exact integer arithmetic a DuckDB oracle replays
    bit-for-bit (the r5/r6 portable-gate technique):

    - lanes quantized ``floor(x*scale+0.5)`` to int64 (scale=1e3
      here, NOT the usual 1e6: the dup test squares a squared sum,
      so int64 safety needs ``den * dot^2 < 2^63`` — at dim 64,
      den 100, scale 1e3 that holds for |x| <= 2, ample for
      unit-ish embeddings; 1e6 lanes would overflow);
    - cluster seeds are the ``k`` vectors with the smallest
      (md5(id), id) — portable ordering, no RNG;
    - assignment = argmin of the exact integer squared L2 distance,
      ties to the lowest cluster idx (same rule as the hash-green
      Lloyd loop);
    - the cosine test ``cos(a,b) >= sqrt(num/den)`` is evaluated
      sqrt-free: ``dot > 0 AND den*dot^2 >= num*|a|^2*|b|^2`` in
      int64 (defaults num=81 den=100 -> cosine 0.9);
    - ``max_cluster`` caps each cluster at the ``max_cluster``
      members with the smallest (md5(id), id) before pairing — the
      oracle-replayable truncation that keeps candidate pairs
      bounded by k * max_cluster^2 instead of sum-of-cluster^2
      (the capped-LSH lesson, VERDICT r05/r06).

    Returns the REMOVED rows: ``(vec_id, cluster_idx, dup_of)``
    where ``dup_of`` is the kept duplicate with the smallest
    (md5, id) rank — ints only, hash-friendly.

    Scale shape (100 TB): assignment is one expression pass
    (O(n*k*dim)) over a ONE-ROW BROADCAST of the seed set — the
    seeds ride the broadcast value, not the parsed plan text, so
    raising ``k`` to the production ~n/cluster_target leaves the
    plan constant-size (VERDICT r10 nit #2; the former formulation
    embedded the seeds as a SQL literal that grew the parse
    linearly); the pair stage is one shuffle on cluster_idx with
    capped fan-in; nothing but the k seed vectors reaches the
    driver.  Complements lexical MinHash (q:minhash_lsh_pairs)
    and hyperplane LSH (q:embedding_lsh_portable_pairs); the
    reference has no embedding surface at all (beyond-reference
    mandate, BASELINE.json north star)."""
    from pyspark.sql import Window

    clean = F.col(vec_col).isNotNull() & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    q_expr = F.expr(
        f"transform(cast({vec_col} as array<double>),"
        f" x -> cast(floor(x * {float(scale)!r} + 0.5) as bigint))"
    )
    if dim is None:
        probe = (
            emb.where(clean)
            .select(
                F.size(F.col(vec_col)).alias("_d"),
                F.md5(F.col(id_col).cast("string")).alias("_m"),
            )
            .orderBy("_m", "_d")
            .limit(1)
            .collect()
        )
        if not probe:
            return emb.sparkSession.createDataFrame(
                [],
                f"{id_col} {emb.schema[id_col].dataType.simpleString()},"
                " cluster_idx int,"
                f" dup_of {emb.schema[id_col].dataType.simpleString()}",
            )
        dim = int(probe[0]["_d"])
    clean = clean & (F.size(F.col(vec_col)) == dim)
    qdf = (
        emb.where(clean)
        .select(
            F.col(id_col),
            F.md5(F.col(id_col).cast("string")).alias("_m"),
            q_expr.alias("_q"),
        )
        .withColumn(
            "_n2",
            F.expr("aggregate(transform(_q, x -> x*x), 0L, (a, x) -> a + x)"),
        )
    )
    # seed selection in two cheap jobs instead of one expensive one:
    # the ordering (md5, id) never looks at the vector, but a single
    # TakeOrdered over qdf evaluates the 64-lane quantize transform
    # for EVERY row below the sort (plan-verified; 1.25 s at sf0.1).
    # Job 1 ranks ids by (md5, id) alone; job 2 re-reads just those
    # rows (isin pushdown) and quantizes k vectors.  Quantization
    # stays the same Spark expression — no cross-language float
    # replay — and ordering semantics are unchanged.
    seed_ids = [
        r[0]
        for r in emb.where(clean)
        .select(
            F.col(id_col), F.md5(F.col(id_col).cast("string")).alias("_m")
        )
        .orderBy("_m", id_col)
        .limit(k)
        .select(id_col)
        .collect()
    ]
    seed_pred = F.col(id_col).isin(
        [i for i in seed_ids if i is not None]
    )
    if any(i is None for i in seed_ids):
        # a NULL id ranks first under NULLS FIRST md5 ordering but
        # never matches isin — keep it reachable for job 2
        seed_pred = seed_pred | F.col(id_col).isNull()
    seed_rows = (
        qdf.filter(seed_pred)
        .orderBy("_m", id_col)
        .limit(k)
        .select("_q")
        .collect()
        if seed_ids
        else []
    )
    if not seed_rows:
        return emb.sparkSession.createDataFrame(
            [],
            f"{id_col} {emb.schema[id_col].dataType.simpleString()},"
            " cluster_idx int,"
            f" dup_of {emb.schema[id_col].dataType.simpleString()}",
        )
    # argmin of integer squared L2 against the seed set, shipped as a
    # ONE-ROW BROADCAST (VERDICT r10 nit #2): the k seed vectors ride
    # the broadcast value instead of the parsed SQL text, so the plan
    # stays constant-size at the production k ≈ n/cluster_target
    # (the former seed-literal formulation grew the parsed expression
    # linearly in k).  Arithmetic, seed order, and the ties-to-lowest
    # -idx rule are unchanged — hash-identical output; per-row cost
    # is the same O(k·dim) HOF the literal ran.
    from ..functions.localrel import local_rows_df

    seeds_df = local_rows_df(
        emb.sparkSession,
        [([list(r["_q"]) for r in seed_rows],)],
        "_seeds array<array<bigint>>",
    )
    dists = (
        "transform(_seeds, s -> aggregate(zip_with(_q, s,"
        " (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x))"
    )
    # the distance array materializes as its own column so the
    # interpreted aggregate-lambdas run once per row (the argmin
    # references it twice; inlining re-evaluates the whole array per
    # reference — the cluster.py/pq.py lesson, hash-identical output)
    label = F.expr(
        "cast(array_position(_dists, array_min(_dists)) as int) - 1"
    )
    assigned = (
        qdf.crossJoin(F.broadcast(seeds_df))
        .withColumn("_dists", F.expr(dists))
        .select(
            F.col(id_col), "_m", "_q", "_n2", label.alias("cluster_idx")
        )
    )
    w = Window.partitionBy("cluster_idx").orderBy("_m", id_col)
    capped = (
        assigned.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_cluster)
        .drop("_r")
    )
    # r13: the pair stage was a capped self-join whose per-pair dot
    # ran as interpreted zip_with/aggregate lambdas (no codegen for
    # higher-order functions) — ~1.4 s of the gate at sf0.1.  Each
    # capped cluster is a bounded ≤ max_cluster × dim int64 block, so
    # ONE applyInPandas per cluster computes every dot as a numpy
    # int64 matmul and applies the identical ordering + threshold +
    # keeper rules (two's-complement int64 wrap semantics match the
    # JVM exactly).  The window cap upstream already hash-partitions
    # by cluster_idx, so the grouped map adds no exchange.  Rows with
    # a NULL id never paired before (every comparison with a NULL md5
    # is false) — dropped explicitly here.
    idt = emb.schema[id_col].dataType.simpleString()
    num, den, idc = int(threshold_num), int(threshold_den), id_col

    def _pairs_fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {idc: pdf[idc][:0], "cluster_idx": pdf["cluster_idx"][:0],
             "dup_of": pdf[idc][:0]}
        )
        pdf = pdf[pdf["_m"].notna()]
        n = len(pdf)
        if n < 2:
            return empty
        # (md5, id) ascending = the a-before-b orientation AND the
        # keeper rank in one order; mergesort for deterministic ties
        pdf = pdf.sort_values(["_m", idc], kind="mergesort").reset_index(
            drop=True
        )
        q = np.array(pdf["_q"].tolist(), dtype=np.int64)
        n2 = pdf["_n2"].to_numpy(dtype=np.int64)
        dots = q @ q.T
        ok = (dots > 0) & (den * dots * dots >= num * np.outer(n2, n2))
        # strict upper triangle: row i is the lower-ranked partner
        ok &= np.tri(n, n, -1, dtype=bool).T
        dup_j = ok.any(axis=0)
        first_i = ok.argmax(axis=0)
        js = np.nonzero(dup_j)[0]
        if js.size == 0:
            return empty
        return pd.DataFrame(
            {
                idc: pdf[idc].to_numpy()[js],
                "cluster_idx": pdf["cluster_idx"].to_numpy()[js],
                "dup_of": pdf[idc].to_numpy()[first_i[js]],
            }
        )

    return capped.groupBy("cluster_idx").applyInPandas(
        _pairs_fn,
        schema=f"{id_col} {idt}, cluster_idx int, dup_of {idt}",
    )
