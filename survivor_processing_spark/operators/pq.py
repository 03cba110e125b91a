"""Product quantization (PQ): train per-subspace codebooks and
encode every embedding into m small codes — the compression half of
an IVF-PQ ANN index (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the layout FAISS builds at
billion-vector scale).

The engine already ships the other ANN members — brute-force cosine
top-k, hyperplane-LSH buckets, IVF-Flat with a recall-floor contract
(operators/similarity.py) and int8 scalar quantization
(q:embedding_quantize_int8).  PQ is the missing piece that makes
100 TB of embeddings searchable in RAM: a dim=64 float vector (256
bytes) becomes m=4 uint8 codes (4 bytes, 64×), and asymmetric
distances against the m×k codebook approximate the true distance.
The reference has no vector surface at all (it is a pandas scraping
pipeline); this is part of the beyond-reference training-data
mandate.

ENGINE-PORTABLE by the kmeans_lloyd_portable recipe
(operators/cluster.py:127 — integer lanes, md5 seed order, integer
argmin with lowest-idx ties, floor-division centroid means), so a
DuckDB oracle replays training AND encoding bit-for-bit.

Spark-first shape — the subspace loop is a DATA dimension, not a
driver loop: all m sub-quantizers train in the SAME ``iters``
distributed passes.

1. one hygiene+quantize pass pins (id, int64-lane vector), exactly
   like the gated Lloyd (localCheckpoint here; persist
   MEMORY_AND_DISK on a cluster);
2. per iteration, ONE job computes every subspace's assignment (m
   parsed argmin expressions over ``slice(_q, off, sub)``) and ONE
   shuffle aggregates lane sums grouped by (subspace, cluster, lane)
   — ``pos div sub`` recovers the subspace from the exploded lane
   index, so m never multiplies the pass count;
3. driver traffic per iteration is the k·dim lane-sum matrix (the
   same bound as one full-space Lloyd — the m codebooks partition
   the lanes, they don't add any);
4. encoding is a final JVM expression: the m argmin labels as an
   ``array<int>`` plus the exact integer reconstruction error
   (sum of per-subspace min squared distances) — the quantization-
   quality number an index builder monitors.

``pq_portable_oracle`` mechanically generates the DuckDB replay from
the same parameters — one (dist, assign, cent) CTE block per
iteration with ``(i-1)//sub`` as the subspace key, the same
generated-iterative-oracle technique as queries/llm_ann.py
:_lloyd_portable_oracle.  Registration is queued behind the r7
freeze (ROTATION_r07.md); until then tests/test_pq.py pins
Spark == DuckDB on fixed, randomized, and sf0.001 inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.sql_literals import sql_int_array, sql_long_array

_SCALE_SQL = "1000000.0"


def pq_train_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Train m sub-codebooks (k centroids each, ``iters`` Lloyd
    rounds) and encode: returns ``id_col, codes array<int>,
    recon_err bigint`` (exact integer squared reconstruction error
    on the 1e-6 fixed-point grid).

    Vector hygiene matches the gated Lloyd: NULL vectors, vectors
    with a NULL lane, and vectors whose length differs from ``dim``
    are dropped (the oracle mirrors the filters).  ``dim`` defaults
    to the md5-smallest clean vector's length and must be divisible
    by ``m``."""
    if m < 1 or k < 1 or iters < 0:
        raise ValueError(f"bad PQ params m={m} k={k} iters={iters}")
    clean = F.col(vec_col).isNotNull() & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    id_type = df.schema[id_col].dataType.simpleString()
    empty_schema = f"{id_col} {id_type}, codes array<int>, recon_err bigint"
    if dim is None:
        probe = (
            df.where(clean)
            .select(
                F.size(F.col(vec_col)).alias("_d"),
                F.md5(F.col(id_col).cast("string")).alias("_m"),
            )
            .orderBy("_m")
            .limit(1)
            .collect()
        )
        if not probe:
            return df.sparkSession.createDataFrame([], empty_schema)
        dim = int(probe[0]["_d"])
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    clean = clean & (F.size(F.col(vec_col)) == dim)
    qdf = (
        df.where(clean)
        .select(
            F.col(id_col),
            F.expr(
                f"transform(cast({vec_col} as array<double>),"
                f" x -> cast(floor(x * {_SCALE_SQL} + 0.5) as bigint))"
            ).alias("_q"),
        )
        .localCheckpoint(eager=True)
    )
    cents = _fit(qdf, id_col, m, k, iters, sub)
    if cents is None:
        return df.sparkSession.createDataFrame([], empty_schema)

    codes = "array(" + ",".join(
        _label_from_col(cents, sp) for sp in range(m)
    ) + ")"
    recon = " + ".join(f"array_min(_d{sp})" for sp in range(m))
    return _with_dist_cols(qdf, cents, m, sub, id_col).select(
        F.col(id_col),
        F.expr(codes).cast("array<int>").alias("codes"),
        F.expr(recon).cast("bigint").alias("recon_err"),
    )


def _dists_sql(
    cents: dict[int, list[tuple[int, list[int]]]], sp: int, sub: int
) -> str:
    # ONE parsed SQL string per subspace (the py4j literal lesson) —
    # k arrays of sub longs inside a single expr
    off = sp * sub + 1

    def d2(lanes: list[int]) -> str:
        arr = sql_long_array(lanes)
        return (
            f"aggregate(zip_with(slice(_q, {off}, {sub}), {arr},"
            " (a, b) -> (a-b)*(a-b)), 0L, (acc, x) -> acc + x)"
        )

    return "array(" + ",".join(d2(lanes) for _, lanes in cents[sp]) + ")"


def _with_dist_cols(
    df: DataFrame,
    cents: dict[int, list[tuple[int, list[int]]]],
    m: int,
    sub: int,
    *keep: str,
) -> DataFrame:
    """Project the m distance arrays as REAL COLUMNS (`_d{sp}`) in a
    separate Project so each (subspace, centroid) aggregate runs
    ONCE per row.  Embedding the array expression at its use sites
    re-evaluates it per reference (argmin needs it twice, recon a
    third time), and higher-order-function lambdas are interpreted,
    not codegen'd — the textual-inline form measured ~3× slower at
    bench scale.  CollapseProject keeps this projection separate
    because the alias is non-cheap and referenced more than once
    (same Catalyst contract dedup.shingles_from_words relies on)."""
    cols = [F.col(c) for c in keep] + [F.col("_q")] + [
        F.expr(_dists_sql(cents, sp, sub)).alias(f"_d{sp}")
        for sp in range(m)
    ]
    return df.select(*cols)


def _label_from_col(
    cents: dict[int, list[tuple[int, list[int]]]], sp: int
) -> str:
    """Argmin label over the materialized `_d{sp}` column (ties to
    the lowest surviving cluster idx)."""
    labels = sql_int_array(idx for idx, _ in cents[sp])
    return (
        f"element_at({labels},"
        f" cast(array_position(_d{sp}, array_min(_d{sp})) as int))"
    )


def _fit(
    qdf: DataFrame, id_col: str, m: int, k: int, iters: int, sub: int
) -> dict[int, list[tuple[int, list[int]]]] | None:
    """The shared training loop over a prepped (id, _q) frame;
    returns the per-subspace codebooks (None on empty input)."""
    seed_rows = (
        qdf.select("_q", F.md5(F.col(id_col).cast("string")).alias("_m"))
        .orderBy("_m")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        return None
    # per-subspace centroid sets: {sp: [(cluster_idx, sub lanes)]}
    cents: dict[int, list[tuple[int, list[int]]]] = {
        sp: [
            (i, list(r["_q"])[sp * sub : (sp + 1) * sub])
            for i, r in enumerate(seed_rows)
        ]
        for sp in range(m)
    }

    for _ in range(iters):
        # one job: every subspace's argmin labels + exploded lanes;
        # one shuffle: (subspace, cluster, lane) partial sums
        labs = "array(" + ",".join(
            _label_from_col(cents, sp) for sp in range(m)
        ) + ")"
        sums = (
            _with_dist_cols(qdf, cents, m, sub)
            .select(
                F.expr(labs).alias("_labs"),
                F.posexplode("_q").alias("pos", "x"),
            )
            .select(
                F.expr(f"cast(pos div {sub} as int)").alias("sp"),
                F.expr(
                    f"element_at(_labs, cast(pos div {sub} as int) + 1)"
                ).alias("cl"),
                "pos",
                "x",
            )
            .groupBy("sp", "cl", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()  # bounded: k * dim rows across all subspaces
        )
        by_sp: dict[int, dict[int, list[int]]] = {}
        for r in sums:
            lanes = by_sp.setdefault(int(r["sp"]), {}).setdefault(
                int(r["cl"]), [0] * sub
            )
            # local lane index; Python // floors like the SQL identity
            lanes[int(r["pos"]) - int(r["sp"]) * sub] = int(r["s"]) // int(
                r["n"]
            )
        cents = {
            sp: sorted(by_sp.get(sp, {}).items()) for sp in range(m)
        }
        if any(not cents[sp] for sp in range(m)):  # pragma: no cover
            raise RuntimeError("every subspace lost all clusters")
    return cents


def _oracle_ctes(
    m: int,
    k: int,
    iters: int,
    dim: int,
    table: str,
    vec_col: str,
    id_col: str,
) -> str:
    """Shared DuckDB CTE chain (clean .. final_assign) replaying the
    training loop — used by both oracles."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    blocks = [
        f"""
WITH clean AS (
    SELECT {id_col} AS vid, {vec_col} AS v FROM {table}
    WHERE {vec_col} IS NOT NULL
      AND len({vec_col}) = {dim}
      AND len(list_filter({vec_col}, x -> x IS NULL)) = 0
),
vec_lanes AS (
    SELECT e.vid, d.i, (d.i - 1) // {sub} AS sp,
           CAST(floor(CAST(e.v[d.i] AS DOUBLE) * {_SCALE_SQL} + 0.5)
                AS BIGINT) AS q
    FROM clean e, (SELECT unnest(generate_series(1, {dim})) AS i) d
),
cent_0 AS (
    SELECT s.cluster_idx, v.i, v.sp, v.q AS c
    FROM (SELECT vid,
                 ROW_NUMBER() OVER (ORDER BY md5(CAST(vid AS VARCHAR))) - 1
                     AS cluster_idx
          FROM clean
          ORDER BY md5(CAST(vid AS VARCHAR)) LIMIT {k}) s
    JOIN vec_lanes v ON v.vid = s.vid
)"""
    ]
    for t in range(iters):
        blocks.append(
            f""",
dist_{t} AS (
    SELECT v.vid, v.sp, c.cluster_idx,
           SUM((v.q - c.c) * (v.q - c.c)) AS d2
    FROM vec_lanes v JOIN cent_{t} c ON c.i = v.i
    GROUP BY v.vid, v.sp, c.cluster_idx
),
assign_{t} AS (
    SELECT vid, sp, cluster_idx FROM (
        SELECT vid, sp, cluster_idx,
               ROW_NUMBER() OVER (PARTITION BY vid, sp
                                  ORDER BY d2 ASC, cluster_idx ASC) AS r
        FROM dist_{t}) WHERE r = 1
),
cent_{t + 1} AS (
    SELECT a.cluster_idx, v.i, v.sp,
           CAST((SUM(v.q) - ((SUM(v.q) % COUNT(*)) + COUNT(*)) % COUNT(*))
                / COUNT(*) AS BIGINT) AS c
    FROM assign_{t} a
    JOIN vec_lanes v ON v.vid = a.vid AND v.sp = a.sp
    GROUP BY a.cluster_idx, v.i, v.sp
)"""
        )
    blocks.append(
        f""",
dist_{iters} AS (
    SELECT v.vid, v.sp, c.cluster_idx,
           SUM((v.q - c.c) * (v.q - c.c)) AS d2
    FROM vec_lanes v JOIN cent_{iters} c ON c.i = v.i
    GROUP BY v.vid, v.sp, c.cluster_idx
),
final_assign AS (
    SELECT vid, sp, cluster_idx, d2 FROM (
        SELECT vid, sp, cluster_idx, d2,
               ROW_NUMBER() OVER (PARTITION BY vid, sp
                                  ORDER BY d2 ASC, cluster_idx ASC) AS r
        FROM dist_{iters}) WHERE r = 1
)"""
    )
    return "".join(blocks)


def pq_portable_oracle(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`pq_train_encode` — the gated-Lloyd CTE chain with
    ``(i-1)//{sub}`` as the subspace key, one (dist, assign, cent)
    block per iteration, then the code-list + reconstruction-error
    select.  Output: ``id, codes, recon_err``."""
    ctes = _oracle_ctes(m, k, iters, dim, table, vec_col, id_col)
    return (
        f"{ctes}\n"
        f"SELECT vid AS {id_col},\n"
        "       list(CAST(cluster_idx AS INTEGER) ORDER BY sp) AS codes,\n"
        "       CAST(SUM(d2) AS BIGINT) AS recon_err\n"
        "FROM final_assign\n"
        "GROUP BY vid"
    )


def quantize_query(query: list[float]) -> list[int]:
    """The shared 1e-6 fixed-point quantization of a query vector —
    computed ONCE driver-side and injected into both engines, so the
    ADC gate cannot hinge on a float rounding difference."""
    import math

    if any(x is None for x in query):
        raise ValueError("query vector has a NULL lane")
    return [int(math.floor(float(x) * 1e6 + 0.5)) for x in query]


def pq_adc_topk(
    df: DataFrame,
    query: list[float],
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Asymmetric-distance top-k: train the PQ codebooks, encode the
    corpus, and rank it against ``query`` by the ADC approximation —
    the query-time half of an IVF-PQ index (Jégou et al. 2011 §IV:
    the query stays unquantized; each subspace contributes the exact
    distance from the query's sub-vector to the ASSIGNED centroid).
    Returns the ``topk`` rows of ``id_col, codes array<int>,
    adc_dist bigint`` ordered by (adc_dist ASC, id ASC).

    The scan is one JVM expression pass: the m ADC lookup tables are
    k integers each, computed driver-side from the trained codebooks
    and the quantized query (exact integer arithmetic shared with the
    oracle), embedded as one parsed literal per subspace, and indexed
    by the same argmin that picks the code — then a TakeOrdered
    top-k, never a full sort.  At 100 TB this is the RAM-resident
    re-rank stage: 4 bytes/vector of codes + a 32-entry table beat
    re-reading 256-byte float vectors by two orders of magnitude of
    memory bandwidth."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    dim = len(query)
    if dim % m != 0:
        raise ValueError(f"len(query)={dim} not divisible by m={m}")
    sub = dim // m
    qlanes = quantize_query(query)
    clean = (
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
        & (F.size(F.col(vec_col)) == dim)
    )
    id_type = df.schema[id_col].dataType.simpleString()
    qdf = (
        df.where(clean)
        .select(
            F.col(id_col),
            F.expr(
                f"transform(cast({vec_col} as array<double>),"
                f" x -> cast(floor(x * {_SCALE_SQL} + 0.5) as bigint))"
            ).alias("_q"),
        )
        .localCheckpoint(eager=True)
    )
    cents = _fit(qdf, id_col, m, k, iters, sub)
    if cents is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, codes array<int>, adc_dist bigint"
        )

    def adc_sql(sp: int) -> str:
        qs = qlanes[sp * sub : (sp + 1) * sub]
        tbl = sql_long_array(
            sum((a - b) * (a - b) for a, b in zip(qs, lanes))
            for _, lanes in cents[sp]
        )
        return (
            f"element_at({tbl},"
            f" cast(array_position(_d{sp}, array_min(_d{sp})) as int))"
        )

    codes = "array(" + ",".join(
        _label_from_col(cents, sp) for sp in range(m)
    ) + ")"
    adc = " + ".join(adc_sql(sp) for sp in range(m))
    return (
        _with_dist_cols(qdf, cents, m, sub, id_col)
        .select(
            F.col(id_col),
            F.expr(codes).cast("array<int>").alias("codes"),
            F.expr(adc).cast("bigint").alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def pq_adc_topk_oracle(
    query: list[float],
    topk: int = 10,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`pq_adc_topk` — the shared training CTEs, the quantized
    query as a VALUES lane table (the SAME integers the Spark side
    embeds), ADC per (subspace, centroid) from cent_{iters}, and the
    (adc ASC, id ASC) top-k."""
    dim = len(query)
    if dim % m != 0:
        raise ValueError(f"len(query)={dim} not divisible by m={m}")
    sub = dim // m
    qlanes = quantize_query(query)
    ctes = _oracle_ctes(m, k, iters, dim, table, vec_col, id_col)
    vals = ", ".join(f"({i + 1}, {q})" for i, q in enumerate(qlanes))
    return f"""{ctes},
qlanes AS (
    SELECT i, (i - 1) // {sub} AS sp, CAST(q AS BIGINT) AS q
    FROM (VALUES {vals}) t(i, q)
),
adc AS (
    SELECT c.sp, c.cluster_idx, SUM((l.q - c.c) * (l.q - c.c)) AS d2
    FROM cent_{iters} c JOIN qlanes l ON l.i = c.i
    GROUP BY c.sp, c.cluster_idx
),
ranked AS (
    SELECT a.vid,
           list(CAST(a.cluster_idx AS INTEGER) ORDER BY a.sp) AS codes,
           CAST(SUM(t.d2) AS BIGINT) AS adc_dist
    FROM final_assign a
    JOIN adc t ON t.sp = a.sp AND t.cluster_idx = a.cluster_idx
    GROUP BY a.vid
)
SELECT vid AS {id_col}, codes, adc_dist
FROM ranked
ORDER BY adc_dist ASC, vid ASC
LIMIT {int(topk)}"""
