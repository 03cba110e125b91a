"""LLM-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — the beyond-reference operator set
(SURVEY.md §7 Phase 6) over the documents/embeddings tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, table_rows
from ..functions.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_exprs,
    rolling_min_by_doc,
    subword_count_expr,
    token_count_expr,
)
from ..operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    near_dedup_components,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    spread_rows,
)
from ..operators.multimodal import decode_media, frame_sample, text_as_media
from ..operators.similarity import (
    all_pairs_above,
    brute_force_topk,
    ivf_recall_bound,
    ivf_topk,
    lsh_pairs_above,
)
from ._registry import register

# --- dedup -------------------------------------------------------------------


@register(
    "exact_dedup_docs",
    doc="exact dedup: hash-groupBy on normalized text, min-id representative",
    oracle="""
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM (SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents)
GROUP BY norm
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id")


@register(
    "ngram_jaccard_pairs",
    doc="exact word-3-gram Jaccard near-dup pairs at >=0.5 via "
    "prefix-filtered inverted index (AllPairs/SSJoin): only each doc's "
    "rarest n-ceil(t*n)+1 shingles are indexed — recall provably exact "
    "at the threshold, candidate volume output-sensitive instead of "
    "quadratic (the uncapped index measured 137M candidate pairs and a "
    "20x super-linear bench step at ~sf1)",
    oracle="""
WITH w AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS words
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               array_to_string(words[i:i+2], ' ') AS shingle
        FROM w, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
        )
    )
), cnt AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id1, id2,
       n_common * 1.0 / (c1.n + c2.n - n_common) AS jaccard
FROM common
JOIN cnt c1 ON c1.doc_id = id1
JOIN cnt c2 ON c2.doc_id = id2
WHERE n_common * 1.0 / (c1.n + c2.n - n_common) >= 0.5
""",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # threshold 0.5 = the realistic near-dup semantic (same as the
    # MinHash query's verify threshold); the oracle computes the FULL
    # unfiltered exact join, so it also proves the prefix filter's
    # exact-recall claim.  max_posting (operator default 1000) never
    # binds at test scale, keeping the oracle byte-exact.
    return ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.5)


@register(
    "minhash_lsh_pairs",
    doc="MinHash(64)+LSH(16x4) near-dup candidates, exact-Jaccard verified "
    "at >=0.5 — the scale path for corpus dedup. Oracle: the LSH candidate "
    "set is probabilistic-by-construction (though deterministic given the "
    "hash family), so the gate is the exact-verified subset vs full exact "
    "Jaccard at the same threshold; at 16 bands x 4 rows, P[miss] at "
    "jaccard 0.5 is (1-0.5^4)^16 ~ 35%, >=0.8 <0.1%% — candidates here are "
    "all >=0.9, where recall is ~1.",
    oracle="""
WITH w AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS words
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               array_to_string(words[i:i+2], ' ') AS shingle
        FROM w, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
        )
    )
), cnt AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id1, id2
FROM common
JOIN cnt c1 ON c1.doc_id = id1
JOIN cnt c2 ON c2.doc_id = id2
WHERE n_common * 1.0 / (c1.n + c2.n - n_common) >= 0.5
""",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(d, "text", "doc_id", threshold=0.5).select(
        "id1", "id2"
    )


@register(
    "simhash_near_pairs",
    doc="SimHash-64 near-dup pairs at hamming<=3 via 4x16-bit-chunk "
    "bucketing — the filter EQUALS the pigeonhole guarantee (a 16-bit "
    "chunk must agree for d<=3), so recall is exact, buckets stay cool "
    "(65536 values/chunk), and hot buckets are capped at "
    "max_posting=1000.  Signature values are engine-hash-specific "
    "(xxhash64), so the gate is PLANTED RECALL (VERDICT r06 #3 — the "
    "rows-only registration recorded nothing): the query unions the "
    "corpus with deterministic copies of the 50 md5-smallest docs — "
    "one identical (signature-equal, MUST be recovered: exercises "
    "bucketing, posting cap, popcount verify end to end) and one "
    "with a prepended word (a real near-dup; measured recall 36-42 "
    "of 50 at the gate scales, floored at half) — and emits the "
    "recall contract as booleans the oracle asserts, plus n_planted, "
    "which the oracle computes itself by replaying the planting "
    "arithmetic.  Semantics of the signature pipeline stay hash-green "
    "via the portable twin q:simhash_portable_pairs",
    oracle="""
SELECT CAST(LEAST(50, (SELECT COUNT(*) FROM documents)) AS BIGINT)
           AS n_planted,
       TRUE AS exact_recall_total,
       TRUE AS edited_recall_above_half
""",
)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = (
        d.withColumn("_m", F.md5(F.col("doc_id").cast("string")))
        .orderBy("_m")
        .limit(50)
        .drop("_m")
    )
    exact = base.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    edited = base.select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.concat(F.lit("zzyzx "), F.col("text")).alias("text"),
    )
    aug = d.unionByName(exact).unionByName(edited)
    pairs = simhash_near_pairs(
        aug, "text", "doc_id", max_hamming=3, max_posting=1000, n_chunks=4
    ).select("id1", "id2")
    tp_exact = base.select(
        F.col("doc_id").alias("id1"),
        (F.col("doc_id") + F.lit(10_000_000)).alias("id2"),
    )
    tp_edit = base.select(
        F.col("doc_id").alias("id1"),
        (F.col("doc_id") + F.lit(20_000_000)).alias("id2"),
    )
    n_pl = base.agg(F.count(F.lit(1)).alias("np"))
    hit_e = tp_exact.join(pairs, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("he")
    )
    hit_d = tp_edit.join(pairs, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("hd")
    )
    return (
        n_pl.crossJoin(hit_e)
        .crossJoin(hit_d)
        .select(
            F.col("np").cast("long").alias("n_planted"),
            (F.col("he") == F.col("np")).alias("exact_recall_total"),
            (F.col("hd") * 2 >= F.col("np")).alias("edited_recall_above_half"),
        )
    )


@register(
    "simhash_portable_pairs",
    doc="the SAME SimHash machinery (per-bit token votes, pigeonhole "
    "chunk bucketing, popcount verify) over an ENGINE-PORTABLE token "
    "hash — the first 15 hex chars of md5, a 60-bit value DuckDB "
    "computes identically — with 48 voted bits, 6 chunks, hamming<=5 "
    "and no posting cap, so pigeonhole recall is exact and the "
    "output EQUALS a full O(n^2) hamming scan.  This hash-gates the "
    "simhash family end to end (votes, sign fold, chunking, "
    "popcount); the xxhash64 variant stays registered as the scale "
    "default (q:simhash_near_pairs, rows-only)",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(trim(text)),
                                              '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
), hashes AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
    FROM toks
), votes AS (
    SELECT doc_id, b.b AS b,
           COUNT(*) AS n,
           SUM((h >> b.b) & 1) AS v
    FROM hashes
    CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b) b
    GROUP BY doc_id, b.b
), sigs AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN v * 2 > n
                         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                AS BIGINT) AS sig
    FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 5
""",
)
def simhash_portable_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_portable_pairs

    d = load_table(spark, sf_dir, "documents")
    return simhash_portable_pairs(
        d, "text", "doc_id", max_hamming=5, n_bits=48, n_chunks=6
    )


@register(
    "near_dup_components",
    doc="near-dup clusters: MinHash-LSH pairs -> min-label-propagation "
    "connected components; every doc labeled with its cluster "
    "representative (min id).  Oracle: transitive closure by recursive "
    "CTE over the exact-Jaccard pair set (same >=0.5 threshold whose "
    "LSH recall ~1 gates minhash_lsh_pairs)",
    oracle="""
WITH RECURSIVE w AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS words
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               array_to_string(words[i:i+2], ' ') AS shingle
        FROM w, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
        )
    )
), cnt AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
), pairs AS (
    SELECT id1, id2
    FROM common
    JOIN cnt c1 ON c1.doc_id = id1
    JOIN cnt c2 ON c2.doc_id = id2
    WHERE n_common * 1.0 / (c1.n + c2.n - n_common) >= 0.5
), edges AS (
    SELECT id1 AS a, id2 AS b FROM pairs
    UNION ALL
    SELECT id2, id1 FROM pairs
), walk AS (
    SELECT a AS node, b AS reach FROM edges
    UNION
    SELECT wk.node, e.b FROM walk wk JOIN edges e ON wk.reach = e.a
), comp AS (
    SELECT node, least(node, MIN(reach)) AS component_id
    FROM walk GROUP BY node
)
SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS component_id
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
""",
)
def near_dup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return near_dedup_components(d, "text", "doc_id", threshold=0.5)


@register(
    "embedding_near_dup_pairs",
    doc="embedding-cosine near-dup pairs (>=0.5), brute-force verify",
    oracle="""
SELECT a.vec_id AS id1, b.vec_id AS id2
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return all_pairs_above(e, threshold=0.5)


@register(
    "embedding_lsh_pairs",
    doc="hyperplane-LSH bucketed near-dup pairs, exact-cosine "
    "verified.  4 planes x 16 tables: recall-first banding for the "
    "0.5 threshold; LSH's payoff starts when n^2 is unaffordable "
    "(the 100 TB case).  Plane signs are engine-hash-specific "
    "(xxhash64), so the gate is PLANTED RECALL (VERDICT r06 #3): the "
    "query unions the corpus with deterministic copies of the 50 "
    "md5-smallest vec_ids — one identical (signature-equal in every "
    "table, MUST be recovered: exercises banding, bucket join, "
    "verify) and one with lane 0 nudged +0.01 (cosine ~0.9999, a "
    "true near-dup crossing table boundaries; measured 50/50 at both "
    "gate scales, floored at 80%) — and emits the recall contract as "
    "booleans the oracle asserts, plus n_planted, which the oracle "
    "computes by replaying the planting arithmetic.  The signature "
    "machinery itself stays hash-green via the portable twin "
    "q:embedding_lsh_portable_pairs",
    oracle="""
SELECT CAST(LEAST(50, (SELECT COUNT(*) FROM embeddings)) AS BIGINT)
           AS n_planted,
       TRUE AS exact_recall_total,
       TRUE AS perturbed_recall_above_80pct
""",
)
def embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    base = (
        e.withColumn("_m", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_m")
        .limit(50)
        .drop("_m")
    )
    exact = base.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    pert = base.select(
        (F.col("vec_id") + F.lit(20_000_000)).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> CASE WHEN i = 0 THEN x + 0.01d ELSE x END)"
        ).alias("embedding"),
    )
    aug = e.unionByName(exact).unionByName(pert)
    pairs = lsh_pairs_above(
        aug, threshold=0.5, n_planes=4, n_tables=16
    ).select("id1", "id2")
    tp_exact = base.select(
        F.col("vec_id").alias("id1"),
        (F.col("vec_id") + F.lit(10_000_000)).alias("id2"),
    )
    tp_pert = base.select(
        F.col("vec_id").alias("id1"),
        (F.col("vec_id") + F.lit(20_000_000)).alias("id2"),
    )
    n_pl = base.agg(F.count(F.lit(1)).alias("np"))
    hit_e = tp_exact.join(pairs, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("he")
    )
    hit_p = tp_pert.join(pairs, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("hp")
    )
    return (
        n_pl.crossJoin(hit_e)
        .crossJoin(hit_p)
        .select(
            F.col("np").cast("long").alias("n_planted"),
            (F.col("he") == F.col("np")).alias("exact_recall_total"),
            (F.col("hp") * 5 >= F.col("np") * 4).alias(
                "perturbed_recall_above_80pct"
            ),
        )
    )


@register(
    "embedding_lsh_portable_pairs",
    doc="the SAME hyperplane-LSH banding (4 planes x 16 tables, "
    "bucket join, exact-cosine verify at 0.5) over ENGINE-PORTABLE "
    "building blocks: md5-parity plane signs and integer-lane "
    "projections (floor(x*1e6+0.5) int64 sums — exact, order-free), "
    "so the DuckDB oracle replays the entire signature pipeline and "
    "the value hash gates LSH end to end.  Posting lists carry the "
    "PORTABLE per-bucket cap (64 md5-smallest ids per table+bucket, "
    "replayed identically by the oracle): candidates are bounded by "
    "tables x buckets x cap^2 instead of the sum-of-m^2 blowup the "
    "uncapped 4-bit config had at sf1 (131 s, VERDICT r05); at gate "
    "scale the cap does not bind, so the output equals the exact "
    "replay.  The xxhash64 float-lane variant stays the scale "
    "default (q:embedding_lsh_pairs, rows-only)",
    oracle="""
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
seeds AS (SELECT unnest(generate_series(0, 63)) AS s),
signs AS (
    SELECT i, s,
           CASE WHEN CAST(('0x' || substr(md5(
                         CAST(i - 1 AS VARCHAR) || '_' || CAST(s AS VARCHAR)
                     ), 1, 15)) AS BIGINT) & 1 = 1
                THEN 1 ELSE -1 END AS sgn
    FROM dims, seeds
),
comps AS (
    SELECT e.vec_id, d.i,
           CAST(floor(e.embedding[d.i] * 1e6 + 0.5) AS BIGINT) AS q
    FROM embeddings e, dims d
),
projs AS (
    SELECT c.vec_id, s.s, SUM(c.q * s.sgn) AS proj
    FROM comps c JOIN signs s ON s.i = c.i
    GROUP BY c.vec_id, s.s
),
buckets AS (
    SELECT vec_id, s // 4 AS t,
           SUM(CASE WHEN proj > 0 THEN (1 << (s % 4)) ELSE 0 END) AS bucket
    FROM projs GROUP BY vec_id, s // 4
),
capped AS (
    SELECT vec_id, t, bucket FROM (
        SELECT vec_id, t, bucket,
               ROW_NUMBER() OVER (PARTITION BY t, bucket
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                           vec_id) AS r
        FROM buckets) WHERE r <= 64
),
cand AS (
    SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
    FROM capped a
    JOIN capped b ON a.t = b.t AND a.bucket = b.bucket
                 AND a.vec_id < b.vec_id
)
SELECT c.id1, c.id2
FROM cand c
JOIN embeddings e1 ON e1.vec_id = c.id1
JOIN embeddings e2 ON e2.vec_id = c.id2
WHERE list_cosine_similarity(e1.embedding, e2.embedding) >= 0.5
""",
)
def embedding_lsh_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_portable_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return lsh_portable_pairs(
        e, threshold=0.5, n_planes=4, n_tables=16, max_bucket=64
    )


@register(
    "semantic_dedup_portable",
    doc="ENGINE-PORTABLE SemDeDup (Abbas et al. 2023, public "
    "method): coarse-cluster the embeddings to the 8 md5-smallest "
    "seeds (exact integer squared-L2 argmin, the hash-green Lloyd "
    "assignment rule), then inside each cluster drop every vector "
    "with a lower-(md5,id)-ranked neighbor at cosine >= 0.9 — the "
    "semantic-redundancy pruning a training pipeline runs where "
    "lexical MinHash/SimHash cannot see the duplication.  The "
    "cosine test is sqrt-free integer arithmetic "
    "(100*dot^2 >= 81*|a|^2*|b|^2 on floor(x*1e3+0.5) int64 lanes "
    "— the 1e3 grid keeps den*dot^2 inside int64; 1e6 would "
    "overflow the squared-squared term) and clusters are capped at "
    "the 128 (md5,id)-smallest members before pairing (the "
    "oracle-replayed truncation from the capped-LSH fix, r6), so "
    "candidates are bounded by k*cap^2, never sum-of-cluster^2.  "
    "The synthetic corpus has no natural cosine>=0.9 structure "
    "(max pairwise 0.51 at sf0.01), so the gate PLANTS semantic "
    "duplicates the way the simhash/LSH recall gates do: every "
    "vec_id%10=3 row gains a copy at id+10000000 scaled by 0.999 "
    "in exact double arithmetic both engines replay bit-for-bit.  "
    "Output = removed rows with their kept twin (ints only)",
    oracle="""
WITH aug AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
    FROM embeddings
    UNION ALL
    SELECT vec_id + 10000000,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.999)
    FROM embeddings WHERE vec_id % 10 = 3
),
clean AS (
    SELECT vec_id, embedding FROM aug
    WHERE embedding IS NOT NULL
      AND len(embedding) = 64
      AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
lanes AS (
    SELECT e.vec_id, d.i,
           CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000.0 + 0.5)
                AS BIGINT) AS q
    FROM clean e, (SELECT unnest(generate_series(1, 64)) AS i) d
),
vecs AS (
    SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS m,
           CAST(SUM(q * q) AS BIGINT) AS n2
    FROM lanes GROUP BY vec_id
),
seed_lanes AS (
    SELECT s.cluster_idx, l.i, l.q
    FROM (SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY m, vec_id) - 1 AS cluster_idx
          FROM vecs ORDER BY m, vec_id LIMIT 8) s
    JOIN lanes l ON l.vec_id = s.vec_id
),
d2 AS (
    SELECT l.vec_id, c.cluster_idx,
           SUM((l.q - c.q) * (l.q - c.q)) AS d2
    FROM lanes l JOIN seed_lanes c ON c.i = l.i
    GROUP BY l.vec_id, c.cluster_idx
),
assign AS (
    SELECT vec_id, cluster_idx FROM (
        SELECT vec_id, cluster_idx,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cluster_idx ASC) AS r
        FROM d2) WHERE r = 1
),
capped AS (
    SELECT vec_id, cluster_idx, m, n2 FROM (
        SELECT a.vec_id, a.cluster_idx, v.m, v.n2,
               ROW_NUMBER() OVER (PARTITION BY a.cluster_idx
                                  ORDER BY v.m, a.vec_id) AS r
        FROM assign a JOIN vecs v ON v.vec_id = a.vec_id)
    WHERE r <= 128
),
dups AS (
    SELECT x.cluster_idx, x.vec_id AS ida, x.m AS ma,
           y.vec_id AS idb, dot
    FROM (
        SELECT x.cluster_idx, x.vec_id, y_id,
               CAST(SUM(la.q * lb.q) AS BIGINT) AS dot
        FROM (SELECT cluster_idx, vec_id FROM capped) x
        JOIN (SELECT cluster_idx, vec_id AS y_id FROM capped) y
          ON y.cluster_idx = x.cluster_idx
        JOIN lanes la ON la.vec_id = x.vec_id
        JOIN lanes lb ON lb.vec_id = y_id AND lb.i = la.i
        GROUP BY x.cluster_idx, x.vec_id, y_id
    ) d(cluster_idx, x_id, y_id, dot)
    JOIN capped x ON x.vec_id = d.x_id AND x.cluster_idx = d.cluster_idx
    JOIN capped y ON y.vec_id = d.y_id AND y.cluster_idx = d.cluster_idx
    WHERE (x.m < y.m OR (x.m = y.m AND x.vec_id < y.vec_id))
      AND dot > 0 AND 100 * dot * dot >= 81 * x.n2 * y.n2
)
SELECT idb AS vec_id, CAST(cluster_idx AS INTEGER) AS cluster_idx,
       ida AS dup_of
FROM (SELECT idb, cluster_idx, ida,
             ROW_NUMBER() OVER (PARTITION BY idb
                                ORDER BY ma, ida) AS r
      FROM dups)
WHERE r = 1
""",
)
def semantic_dedup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup_portable as _semdedup

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    planted = e.filter(F.col("vec_id") % 10 == 3).select(
        (F.col("vec_id") + 10000000).alias("vec_id"),
        F.expr(
            "transform(cast(embedding as array<double>), x -> x * 0.999D)"
        ).alias("embedding"),
    )
    return _semdedup(base.unionByName(planted), k=8, max_cluster=128, dim=64)


# RETIRED r8 (VERDICT r07 #2 growth discipline): q:cluster_assign_
# portable — the single assignment step is performed (and therefore
# gated) inside EVERY iteration of the two hash-green full-Lloyd
# twins, q:kmeans_lloyd_portable (identical integer-lane argmin +
# md5 seeds) and q:kmeans_clusters (same-seed float parity gate);
# the standalone step added no oracle coverage the loop gates lack.
# assign_clusters_portable itself stays unit-tested
# (tests/test_operators.py).  Accounting: ROTATION_r08.md.


def _lloyd_portable_oracle(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """DuckDB replay of the integer-lane Lloyd loop: one
    (dist, assign, cent) CTE block per iteration, mechanically
    generated so the SQL cannot drift from the loop structure.
    Centroid update = exact integer floor division via the
    nonneg-mod identity (DuckDB ``%`` truncates like Spark's; the
    numerator is made exactly divisible before the ``/``)."""
    blocks = [
        f"""
WITH clean AS (
    -- vector hygiene, mirrored from the Spark side: non-NULL,
    -- no NULL lane, exactly dim lanes
    SELECT vec_id, embedding FROM embeddings
    WHERE embedding IS NOT NULL
      AND len(embedding) = {dim}
      AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
vec_lanes AS (
    SELECT e.vec_id, d.i,
           CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS q
    FROM clean e, (SELECT unnest(generate_series(1, {dim})) AS i) d
),
cent_0 AS (
    SELECT s.cluster_idx, v.i, v.q AS c
    FROM (SELECT vec_id,
                 ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
                     AS cluster_idx
          FROM clean
          ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {k}) s
    JOIN vec_lanes v ON v.vec_id = s.vec_id
)"""
    ]
    for t in range(iters):
        blocks.append(
            f""",
dist_{t} AS (
    SELECT v.vec_id, c.cluster_idx, SUM((v.q - c.c) * (v.q - c.c)) AS d2
    FROM vec_lanes v JOIN cent_{t} c ON c.i = v.i
    GROUP BY v.vec_id, c.cluster_idx
),
assign_{t} AS (
    SELECT vec_id, cluster_idx FROM (
        SELECT vec_id, cluster_idx,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cluster_idx ASC) AS r
        FROM dist_{t}) WHERE r = 1
),
cent_{t + 1} AS (
    SELECT a.cluster_idx, v.i,
           CAST((SUM(v.q) - ((SUM(v.q) % COUNT(*)) + COUNT(*)) % COUNT(*))
                / COUNT(*) AS BIGINT) AS c
    FROM assign_{t} a JOIN vec_lanes v ON v.vec_id = a.vec_id
    GROUP BY a.cluster_idx, v.i
)"""
        )
    blocks.append(
        f""",
dist_{iters} AS (
    SELECT v.vec_id, c.cluster_idx, SUM((v.q - c.c) * (v.q - c.c)) AS d2
    FROM vec_lanes v JOIN cent_{iters} c ON c.i = v.i
    GROUP BY v.vec_id, c.cluster_idx
)
SELECT vec_id, CAST(cluster_idx AS INTEGER) AS cluster_idx
FROM (SELECT vec_id, cluster_idx,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, cluster_idx ASC) AS r
      FROM dist_{iters})
WHERE r = 1
"""
    )
    return "".join(blocks)


@register(
    "kmeans_lloyd_portable",
    doc="ENGINE-PORTABLE full Lloyd's k-means (3 complete "
    "assignment/update iterations, k=8): extends the r5 argmax-replay "
    "technique from one assignment step to the whole loop — vectors "
    "quantized floor(x*1e6+0.5) to int64 lanes, md5(id) seed order, "
    "exact integer squared-L2 argmin (ties to lowest idx), and the "
    "centroid update as the exact integer FLOOR-DIVISION mean, which "
    "both engines compute identically (float means are not portable; "
    "the 1e-6 fixed-point grid is the documented rounding).  "
    "Hash-gates the iterative clustering path that kmeans_clusters "
    "(float Lloyd, rows-only) exercises approximately",
    oracle=_lloyd_portable_oracle(k=8, iters=3, dim=64),
)
def kmeans_lloyd_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import kmeans_lloyd_portable as _lloyd

    e = load_table(spark, sf_dir, "embeddings")
    return _lloyd(e, "embedding", "vec_id", k=8, iters=3, dim=64)


@register(
    "incremental_dedup_new_docs",
    doc="rolling-crawl dedup: does a NEW batch (doc_id % 10 = 0) "
    "duplicate anything in the EXISTING corpus (doc_id % 10 != 0)? "
    "MinHash signatures for the batch, one hash join against the "
    "corpus's banded LSH index (the persistable lsh_band_index "
    "table), exact-Jaccard verify — cost scales with the batch, "
    "never the corpus.  Oracle: the full asymmetric exact-Jaccard "
    "join at the same threshold; candidates here are near-identical "
    "planted dups where LSH recall is ~1 (same regime as "
    "q:minhash_lsh_pairs)",
    oracle="""
WITH sh AS (
    SELECT doc_id, shingle FROM (
        SELECT doc_id,
               array_to_string(words[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'), ' ')
                         AS words
              FROM documents) w,
             LATERAL (SELECT unnest(generate_series(1,
                          greatest(len(words) - 2, 1))) AS i)
    ) GROUP BY doc_id, shingle
), cnt AS (
    SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), common AS (
    SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
    GROUP BY a.doc_id, b.doc_id
)
SELECT new_id, corpus_id,
       round(n_common * 1.0 / (c1.n + c2.n - n_common), 6) AS jaccard
FROM common
JOIN cnt c1 ON c1.doc_id = new_id
JOIN cnt c2 ON c2.doc_id = corpus_id
WHERE n_common * 1.0 / (c1.n + c2.n - n_common) >= 0.5
""",
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_match_against_corpus

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    out = minhash_match_against_corpus(
        new, corpus, "text", "doc_id", threshold=0.5
    )
    return out.select(
        "new_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


@register(
    "dataset_split_hash",
    doc="deterministic content-keyed train/val/test split — the "
    "holdout assignment a training pipeline needs to be stable "
    "across re-runs and engines: first hex char of md5(doc_id) "
    "buckets 16 ways (0-b train 75%, c-d val, e-f test), then "
    "per-(lang, split) doc and char totals.  Pure projection + one "
    "aggregation; md5 of the decimal id string is engine-portable "
    "where xxhash64 is Spark-specific",
    oracle="""
SELECT lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                 THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, split
""",
)
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(c < "c", "train").when(c < "e", "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- similarity search -------------------------------------------------------


@register(
    "cosine_topk",
    doc="brute-force cosine top-10 against a fixed query vector "
    "(vec_id=0's embedding); ranks are ints so the hash is fp-safe",
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id
       ) AS INTEGER) AS sim_rank,
       e.vec_id
FROM embeddings e, q
QUALIFY sim_rank <= 10
""",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    return brute_force_topk(e, [float(x) for x in qvec], k=10)


# RETIRED r8 (VERDICT r07 #2/#4): q:ivf_topk — the registry's only
# never-hash-green row (rows+schema partial, approximate recall by
# construction).  Its family is fully carried by q:ivf_topk_exact
# (the SAME code path degraded-to-exact, full value hash) and
# q:ivf_recall_bound (the planted recall-floor contract adjudicating
# the approximate configuration); the n_probe=4 behavior also stays
# pinned in tests/test_operators.py.  Accounting: ROTATION_r08.md.


@register(
    "ivf_topk_exact",
    doc="the SAME IVF-Flat code path (coarse quantizer, cluster "
    "assignment, isin-pushdown probe filter, per-list brute force) in "
    "its degraded-to-exact configuration n_probe = n_centroids: every "
    "inverted list is probed, so the result is bit-identical to exact "
    "brute-force top-10 and the full value-hash oracle applies.  This "
    "hash-gates the IVF machinery itself; the approximate n_probe=4 "
    "configuration is adjudicated by q:ivf_recall_bound (its "
    "partial-row registration was RETIRED r8).  The "
    "degrades-to-exact property is also pinned in "
    "tests/test_operators.py",
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id
       ) AS INTEGER) AS sim_rank,
       e.vec_id
FROM embeddings e, q
QUALIFY sim_rank <= 10
""",
)
def ivf_topk_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    return ivf_topk(
        e, [float(x) for x in qvec], k=10, n_centroids=16, n_probe=16
    )


@register(
    "ivf_recall_bound",
    doc="the IVF-Flat accuracy CONTRACT as a checkable row (queued in "
    "ROTATION_r06.md; the same error-bound technique that turned the "
    "sketch row hash-green in r6): run the approximate n_probe=4 IVF "
    "top-10 AND the exact brute-force top-10 in one pipeline over the "
    "serving config (n_probe=4 of 16 lists — the partial-row "
    "q:ivf_topk registration this gate replaced, RETIRED r8), "
    "semi-join the id sets, and emit "
    "(k, recall >= ceil(0.5*k)) — ANN result SETS are never "
    "bit-comparable across engines, their recall floor is.  Both arms "
    "share the corpus scan; the join is k-vs-k row counts, "
    "driver-free and output-bounded.  operators/similarity.py:295",
    oracle="""
SELECT 10 AS k, TRUE AS recall_above_floor
""",
)
def ivf_recall_bound_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    )
    return ivf_recall_bound(
        e,
        [float(x) for x in qvec],
        k=10,
        n_centroids=16,
        n_probe=4,
        min_recall=0.5,
    )


# --- text analysis -----------------------------------------------------------


@register(
    "text_quality_scores",
    doc="quality signals per doc: char/token counts, alpha ratio, avg "
    "token length, stopword ratio (single small-int divisions → "
    "bit-identical doubles)",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                             ' ')) AS INTEGER) AS n_tokens,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)
           AS alpha_ratio,
       length(text) * 1.0
           / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                              ' ')) AS avg_token_len,
       len(list_intersect(
               list_distinct(string_split(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
               ['the','a','of','and','to','in','is','that'])) * 1.0
           / len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                              ' ')) AS stopword_ratio
FROM documents
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ex = quality_score_exprs(F.col("text"))
    return d.select(
        "doc_id",
        ex["n_chars"].cast("int").alias("n_chars"),
        ex["n_tokens"].cast("int").alias("n_tokens"),
        ex["alpha_ratio"].alias("alpha_ratio"),
        ex["avg_token_len"].alias("avg_token_len"),
        ex["stopword_ratio"].alias("stopword_ratio"),
    )


@register(
    "lang_id_heuristic",
    doc="stopword-profile language guess (en/es/de) with deterministic "
    "tie order; agreement with the labeled lang column",
    oracle="""
WITH toks AS (
    SELECT doc_id, lang,
           list_distinct(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
    FROM documents
), scores AS (
    SELECT doc_id, lang,
           len(list_intersect(t, ['the','a','of','and','to','in','is','that']))
               AS s_en,
           len(list_intersect(t, ['el','la','de','que','y','en','un','es']))
               AS s_es,
           len(list_intersect(t, ['der','die','das','und','zu','ein','ist','nicht']))
               AS s_de
    FROM toks
)
SELECT doc_id, lang,
       CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS lang_guess
FROM scores
""",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id_expr(F.col("text")).alias("lang_guess"))


@register(
    "doc_fingerprint",
    doc="md5-of-sorted-distinct-tokens document fingerprint + whitespace "
    "token count",
    oracle="""
SELECT doc_id,
       md5(array_to_string(
           list_sort(list_distinct(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))),
           ' ')) AS fingerprint,
       CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                             ' ')) AS INTEGER) AS n_tokens
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint_expr(F.col("text")).alias("fingerprint"),
        token_count_expr(F.col("text")).cast("int").alias("n_tokens"),
    )


@register(
    "rolling_fingerprint",
    doc="winnowing-style rolling-hash sketch (min hash over char "
    "8-gram windows; md5 mode for the cross-engine gate, xxhash64 at "
    "scale) + BPE-ish subword token count (alnum runs + standalone "
    "punctuation)",
    oracle="""
SELECT doc_id,
       list_min(list_transform(
           range(1, greatest(length(text) - 7, 1) + 1),
           i -> md5(substring(text, CAST(i AS INTEGER), 8)))) AS rolling_min,
       CAST(len(list_filter(
           string_split_regex(
               regexp_replace(lower(text), '([^a-z0-9\\s])', ' \\1 ', 'g'),
               '\\s+'),
           x -> x != '')) AS INTEGER) AS n_subwords
FROM documents
""",
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rolling_min_by_doc is the codegen'd corpus-pass form of
    # rolling_hash_expr — bit-identical output (pinned by
    # tests/test_textstats.py), 22.7 s → 2.6 s on the 10x fixture.
    d = load_table(spark, sf_dir, "documents")
    return rolling_min_by_doc(
        d,
        "text",
        "doc_id",
        window=8,
        algo="md5",
        carry_cols=(
            subword_count_expr("text").cast("int").alias("n_subwords"),
        ),
    )


# --- multimodal plumbing -----------------------------------------------------


@register(
    "multimodal_decode_features",
    doc="binary media column + mapInPandas Arrow-batched decode (stub "
    "codec: byte length + md5 digest + digest-derived features); the "
    "Spark-side plumbing (schema, batching, partition parallelism) is real",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    return decode_media(media, fake=True).select("asset_id", "n_bytes", "digest")


@register(
    "multimodal_header_parse",
    doc="REAL media decode, no codec libs: synthesize fully valid "
    "PNG (zlib IDAT + CRCs) / GIF87a / 16-bit PCM WAV files per doc "
    "(format = doc_id % 3) in one mapInPandas pass, then "
    "decode_media(fake=False) parses the actual container headers "
    "back — PNG IHDR big-endian dims, GIF little-endian logical "
    "screen, WAV fmt/data chunk walk for duration.  The oracle "
    "predicts the parsed metadata in closed form; duration is the "
    "same int/int double division on both engines (bit-equal)",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
            ELSE 'audio/wav' END AS mime,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN CAST(doc_id % 64 + 1 AS INTEGER)
            WHEN 1 THEN CAST(doc_id % 100 + 1 AS INTEGER)
            ELSE NULL END AS width,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN CAST(doc_id % 48 + 1 AS INTEGER)
            WHEN 1 THEN CAST(doc_id % 80 + 1 AS INTEGER)
            ELSE NULL END AS height,
       CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 2 THEN CAST((doc_id % 500) * 32 AS DOUBLE) / 16000.0
            ELSE NULL END AS duration_s
FROM documents
""",
)
def multimodal_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        synth_gif,
        synth_png,
        synth_wav,
    )

    # CPU-bound Python codec over a tiny id column: row-aware spread
    # before the first mapInPandas — the sf1 doc table is one parquet
    # split (the GIF-query lesson) so it must widen, but a fixed
    # 32-way spread doubles the tiny-SF wall time on task overhead;
    # footer row count sizes the stage instead (clamps to all cores
    # at scale)
    d = spread_rows(
        load_table(spark, sf_dir, "documents").select("doc_id"),
        table_rows(sf_dir, "documents"),
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                kind = i % 3
                if kind == 0:
                    blob = synth_png(i % 64 + 1, i % 48 + 1)
                elif kind == 1:
                    blob = synth_gif(i % 100 + 1, i % 80 + 1)
                else:
                    blob = synth_wav((i % 500) * 16)
                rows.append((i, blob, None))
            yield pd.DataFrame(
                rows, columns=["asset_id", "media", "media_meta"]
            )

    media = d.mapInPandas(synth, schema=MEDIA_SCHEMA)
    return decode_media(media, fake=False).select(
        "asset_id", "mime", "width", "height", "duration_s"
    )


@register(
    "multimodal_resize_pipeline",
    doc="REAL distributed image resize, no codec libs: synthesize a "
    "doc-dependent grayscale gradient PNG per document (w = "
    "doc_id%13+4, h = doc_id%7+3, pixel(x,y) = (doc_id+37x+11y)%256), "
    "nearest-neighbor resize every blob to 4x3 through the stdlib "
    "PNG codec (resize_media_nn: zlib decode, unfilter, sample, "
    "re-encode), decode the OUTPUT blob again and emit its parsed "
    "dims plus the sum of its 12 pixels.  The oracle replays the "
    "whole pixel pipeline in closed form (NN sample index x*w//4, "
    "y*h//3) — a wrong filter impl, sample index, or re-encode "
    "corrupts pixel_sum, so this hash-gates the codec end to end",
    oracle="""
SELECT CAST(d.doc_id AS BIGINT) AS asset_id,
       'image/png' AS mime,
       4 AS out_w, 3 AS out_h,
       CAST(SUM((d.doc_id + 37 * ((x.x * (d.doc_id % 13 + 4)) // 4)
                 + 11 * ((y.y * (d.doc_id % 7 + 3)) // 3)) % 256)
            AS BIGINT) AS pixel_sum
FROM documents d
CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS x) x
CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS y) y
GROUP BY d.doc_id
""",
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        png_decode,
        png_encode,
        resize_media_nn,
    )

    # CPU-bound Python codec over a tiny id column: row-aware spread
    # before the first mapInPandas — the sf1 doc table is one parquet
    # split (the GIF-query lesson) so it must widen, but a fixed
    # 32-way spread doubles the tiny-SF wall time on task overhead;
    # footer row count sizes the stage instead (clamps to all cores
    # at scale)
    d = spread_rows(
        load_table(spark, sf_dir, "documents").select("doc_id"),
        table_rows(sf_dir, "documents"),
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = i % 13 + 4, i % 7 + 3
                px = bytes(
                    (i + 37 * x + 11 * y) % 256
                    for y in range(h)
                    for x in range(w)
                )
                rows.append((i, png_encode(w, h, 1, px), None))
            yield pd.DataFrame(rows, columns=["asset_id", "media", "media_meta"])

    def checksum(batches):
        for pdf in batches:
            rows = []
            for asset_id, blob, meta in zip(
                pdf["asset_id"], pdf["media"], pdf["media_meta"]
            ):
                w, h, _nch, px = png_decode(bytes(blob))
                rows.append(
                    (asset_id, meta["mime"], w, h, sum(px))
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "mime", "out_w", "out_h", "pixel_sum"],
            )

    media = d.mapInPandas(synth, schema=MEDIA_SCHEMA)
    resized = resize_media_nn(media, 4, 3)
    return resized.mapInPandas(
        checksum,
        schema="asset_id long, mime string, out_w int, out_h int, "
        "pixel_sum long",
    )


# RETIRED r8 (VERDICT r07 #2): q:multimodal_frame_sample — the
# codec-STUB row-multiplicity gate, superseded by the three REAL
# stdlib codec gates that exercise the same frame_sample dispatch
# end-to-end with content checksums: q:multimodal_gif_frames (LZW
# decode), q:multimodal_wav_slice (RIFF slice), and
# q:multimodal_resize_pipeline (PNG decode/resize).  The fake-mode
# dispatch itself stays unit-tested (tests/test_multimodal.py,
# tests/test_apng.py frame_sample tests).  Accounting:
# ROTATION_r08.md.


@register(
    "multimodal_wav_slice",
    doc="REAL distributed audio frame-sampling, no codec libs: "
    "synthesize a doc-dependent 16-bit mono PCM WAV per document "
    "(rate 800 Hz, n = (doc_id%40+5)*40 samples, sample(i) = "
    "(doc_id*31 + i*7) % 65536 - 32768), slice it into 0.5 s frames "
    "through the stdlib RIFF walk (frame_sample real mode: fmt/data "
    "chunk parse, sample-domain [f*400, (f+1)*400) slice, re-encode "
    "each segment as a standalone valid WAV), then re-parse every "
    "emitted frame and sum its decoded samples.  The oracle replays "
    "sample synthesis + slicing in closed form — a wrong chunk "
    "offset, boundary, or re-encode corrupts sample_sum, so this "
    "hash-gates the audio path end to end (the WAV counterpart of "
    "q:multimodal_resize_pipeline; ffmpeg video decode remains the "
    "documented environment limit)",
    oracle="""
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           (doc_id % 40 + 5) * 40 AS n
    FROM documents
),
frames AS (
    SELECT d.asset_id, d.n, f.f AS frame_idx
    FROM docs d,
         LATERAL (SELECT unnest(generate_series(0,
                      CAST((d.n - 1) // 400 AS BIGINT))) AS f) f
)
SELECT fr.asset_id,
       CAST(fr.frame_idx AS INTEGER) AS frame_idx,
       CAST(fr.frame_idx AS DOUBLE) * CAST(0.5 AS DOUBLE) AS ts_s,
       CAST(least((fr.frame_idx + 1) * 400, fr.n)
            - fr.frame_idx * 400 AS INTEGER) AS n_frame_samples,
       CAST(SUM((fr.asset_id * 31 + i.i * 7) % 65536 - 32768)
            AS BIGINT) AS sample_sum
FROM frames fr,
     LATERAL (SELECT unnest(generate_series(fr.frame_idx * 400,
                  least((fr.frame_idx + 1) * 400, fr.n) - 1)) AS i) i
GROUP BY fr.asset_id, fr.frame_idx, fr.n
""",
)
def multimodal_wav_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import MEDIA_SCHEMA, wav_info

    # CPU-bound Python codec over a tiny id column: row-aware spread
    # before the first mapInPandas — the sf1 doc table is one parquet
    # split (the GIF-query lesson) so it must widen, but a fixed
    # 32-way spread doubles the tiny-SF wall time on task overhead;
    # footer row count sizes the stage instead (clamps to all cores
    # at scale)
    d = spread_rows(
        load_table(spark, sf_dir, "documents").select("doc_id"),
        table_rows(sf_dir, "documents"),
    )

    def synth(batches):
        import struct as _s

        import numpy as np

        from ..operators.multimodal import wav_encode

        fmt = _s.pack("<HHIIHH", 1, 1, 800, 1600, 2, 16)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = (i % 40 + 5) * 40
                # vectorized int16 synthesis ('<i2' = the WAV PCM
                # little-endian lane layout, no per-sample Python loop)
                vals = ((i * 31 + np.arange(n, dtype=np.int64) * 7) % 65536
                        - 32768).astype("<i2")
                rows.append((i, wav_encode(fmt, vals.tobytes()), None))
            yield pd.DataFrame(rows, columns=["asset_id", "media", "media_meta"])

    def checksum(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for asset_id, frame_idx, ts_s, blob in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["ts_s"], pdf["frame"]
            ):
                b = bytes(blob)
                info = wav_info(b)
                n = info["n_samples"]
                vals = np.frombuffer(
                    b, dtype="<i2", count=n, offset=info["data_off"]
                )
                rows.append(
                    (asset_id, frame_idx, ts_s, n, int(vals.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_idx", "ts_s",
                    "n_frame_samples", "sample_sum",
                ],
            )

    media = d.mapInPandas(synth, schema=MEDIA_SCHEMA)
    frames = frame_sample(media, every_s=0.5, fake=False)
    return frames.mapInPandas(
        checksum,
        schema="asset_id long, frame_idx int, ts_s double, "
        "n_frame_samples int, sample_sum long",
    )


@register(
    "multimodal_gif_frames",
    doc="REAL distributed animation frame-sampling, no codec libs "
    "(r7; shrinks the ffmpeg env limit to true video codecs only — "
    "PNG r5, WAV r6, GIF now): synthesize a doc-dependent "
    "multi-frame GIF89a per document (w = id%5+3, h = id%4+2, "
    "n_frames = id%3+1, pixel index(f, j) = (id*7 + f*13 + j) % 256) "
    "through the real stdlib encoder (variable-width GIF LZW, "
    "256-entry global color table), split it with frame_sample real "
    "mode (full GIF parse + LZW decode, each frame re-encoded as a "
    "standalone valid GIF), then re-parse every emitted frame and "
    "sum its decoded palette indices.  The oracle replays synthesis "
    "+ slicing in closed form — a wrong LZW width change, sub-block "
    "boundary, or re-encode corrupts index_sum, so this hash-gates "
    "the animation path end to end.  operators/multimodal.py "
    "gif_frames/gif_encode_frames; round-trip + growth-path "
    "properties in tests/test_round7_ops.py",
    oracle="""
WITH docs AS (
    SELECT CAST(doc_id AS BIGINT) AS asset_id,
           doc_id % 5 + 3 AS w,
           doc_id % 4 + 2 AS h,
           doc_id % 3 + 1 AS nf
    FROM documents
),
frames AS (
    SELECT asset_id, w, h, f.f AS frame_idx
    FROM docs, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f
)
SELECT fr.asset_id,
       CAST(fr.frame_idx AS INTEGER) AS frame_idx,
       CAST(fr.w AS INTEGER) AS width,
       CAST(fr.h AS INTEGER) AS height,
       CAST(fr.w * fr.h AS INTEGER) AS n_pixels,
       CAST(SUM((fr.asset_id * 7 + fr.frame_idx * 13 + j.j) % 256)
            AS BIGINT) AS index_sum
FROM frames fr,
     LATERAL (SELECT unnest(generate_series(0, fr.w * fr.h - 1)) AS j) j
GROUP BY fr.asset_id, fr.frame_idx, fr.w, fr.h
""",
)
def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import MEDIA_SCHEMA, gif_frames

    # the codec stages are CPU-bound Python over tiny input bytes, so
    # the scan's byte-based split count (ONE partition for the whole
    # sf1 doc-id column) is the wrong parallelism — row-aware spread
    # before the first mapInPandas (measured 38 s -> ~3 s at sf1;
    # hash-identical output).  The LZW decode is the heaviest codec
    # here (~0.45 ms/row), so its chunk is smaller: 300 rows/task
    # keeps sf0.1 at ~17 tasks (measured sweet spot) and still clamps
    # to every core at sf1+
    d = spread_rows(
        load_table(spark, sf_dir, "documents").select("doc_id"),
        table_rows(sf_dir, "documents"),
        rows_per_task=300,
    )

    def synth(batches):
        import numpy as np

        from ..operators.multimodal import gif_encode_frames

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, nf = i % 5 + 3, i % 4 + 2, i % 3 + 1
                frames = [
                    (
                        (i * 7 + f * 13 + np.arange(w * h, dtype=np.int64))
                        % 256
                    )
                    .astype(np.uint8)
                    .tobytes()
                    for f in range(nf)
                ]
                rows.append((i, gif_encode_frames(w, h, frames), None))
            yield pd.DataFrame(rows, columns=["asset_id", "media", "media_meta"])

    def checksum(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for asset_id, frame_idx, blob in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["frame"]
            ):
                doc = gif_frames(bytes(blob))
                _l, _t, fw, fh, idx = doc["frames"][0]
                s = int(
                    np.frombuffer(idx, dtype=np.uint8).sum(dtype=np.int64)
                )
                rows.append((asset_id, frame_idx, fw, fh, len(idx), s))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_idx", "width", "height",
                    "n_pixels", "index_sum",
                ],
            )

    media = d.mapInPandas(synth, schema=MEDIA_SCHEMA)
    frames = frame_sample(media, every_s=1.0, fake=False)
    return frames.mapInPandas(
        checksum,
        schema="asset_id long, frame_idx int, width int, height int, "
        "n_pixels int, index_sum long",
    )


@register(
    "doc_length_quantiles",
    doc="beyond-reference: per-source document-length distribution "
    "(exact continuous percentiles) — the corpus-profiling step before "
    "setting training-data length filters.  Exact percentile is one "
    "sort-based agg per group; at 100 TB swap in approx_percentile "
    "(t-digest sketch, map-side combinable) — same query shape",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 2) AS p25,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.50), 2) AS p50,
       ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 2) AS p75
FROM documents
GROUP BY source
""",
)
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.50)), 2).alias("p50"),
        F.round(F.percentile(F.col("n_chars").cast("double"), F.lit(0.75)), 2).alias("p75"),
    )


# --- training-data curation (operators/curation.py) -------------------------


@register(
    "quality_filter_chain",
    doc="C4/Gopher-style rule-chain quality filter: per-rule pass flags, "
    "overall keep verdict, first-failing-rule audit column — one map-only "
    "projection, rules fused into the scan",
    oracle="""
WITH q AS (
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ')) AS n_tokens,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
           len(list_intersect(
               list_distinct(string_split(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')),
               ['the','a','of','and','to','in','is','that'])) AS stop_hits
    FROM documents
), r AS (
    SELECT doc_id,
           n_tokens >= 10 AND n_tokens <= 100000 AS len_ok,
           alpha_chars * 1.0 / n_chars >= 0.6 AS alpha_ok,
           n_chars * 1.0 / n_tokens >= 3.0
               AND n_chars * 1.0 / n_tokens <= 12.0 AS word_len_ok,
           stop_hits * 1.0 / n_tokens > 0.0 AS stopword_ok
    FROM q
)
SELECT doc_id, len_ok, alpha_ok, word_len_ok, stopword_ok,
       len_ok AND alpha_ok AND word_len_ok AND stopword_ok AS keep,
       CASE WHEN NOT len_ok THEN 'len_ok'
            WHEN NOT alpha_ok THEN 'alpha_ok'
            WHEN NOT word_len_ok THEN 'word_len_ok'
            WHEN NOT stopword_ok THEN 'stopword_ok' END AS reject_reason
FROM r
""",
)
def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import quality_filter

    d = load_table(spark, sf_dir, "documents")
    return quality_filter(d, "text", "doc_id")


@register(
    "stratified_hash_sample",
    doc="deterministic per-stratum training-mix sampling: keep iff "
    "hash(doc_id) mod 10000 < rate[lang]*10000 — reproducible across "
    "runs/retries/engines (portable multiplicative hash here so DuckDB "
    "agrees; xxhash64 is the operator default at scale), map-only, no "
    "shuffle",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE (doc_id * 2654435761) % 10000 <
      CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25
                WHEN 'zh' THEN 0.1 ELSE 0.05 END * 10000
""",
)
def stratified_hash_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_hash_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        d,
        stratum_col="lang",
        id_col="doc_id",
        rates={"en": 0.5, "es": 0.25, "zh": 0.1},
        default_rate=0.05,
        hash_expr=F.col("doc_id") * F.lit(2654435761),
    )


@register(
    "pack_sequences",
    doc="token-budget sequence packing (concat-then-chunk pretraining "
    "semantics): deterministic contiguous packs per lang stratum, "
    "pack = bucket of the doc's first-token offset; one shuffle on the "
    "strata keys, un-keyed global packing refused by the operator",
    oracle="""
WITH t AS (
    SELECT lang, doc_id,
           CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                                 ' ')) AS BIGINT) AS n_tokens
    FROM documents
), c AS (
    SELECT lang, doc_id, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t
)
SELECT lang, doc_id, n_tokens,
       CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id,
       CAST(cum - n_tokens
            - CAST(floor((cum - n_tokens) / 512) AS BIGINT) * 512
            AS BIGINT) AS pack_offset
FROM c
""",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        d, id_col="doc_id", text_col="text", budget=512, by=["lang"]
    )


@register(
    "pii_redaction",
    doc="PII scrub with typed placeholders (<EMAIL>/<PHONE>): plants "
    "deterministic synthetic PII on 2/3 of docs, redacts with portable "
    "regexes identical in both engines; map-only regexp_replace chain",
    oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(
           text || CASE WHEN doc_id % 3 = 0
                        THEN ' contact u' || CAST(doc_id AS VARCHAR)
                             || '@example.com now'
                        WHEN doc_id % 3 = 1
                        THEN ' call +1 555 0100123 today'
                        ELSE '' END,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4,10}', '<PHONE>', 'g')
           AS redacted
FROM documents
""",
)
def pii_redaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import redact_pii

    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(F.col("doc_id") % 3 == 1, F.lit(" call +1 555 0100123 today"))
            .otherwise(F.lit("")),
        ).alias("redacted"),
    )
    return redact_pii(planted, "redacted")


@register(
    "decontaminate_ngram",
    doc="benchmark decontamination (GPT-3-style n-gram overlap filter): "
    "flag training docs sharing any 8-gram with the eval set "
    "(doc_id % 41 = 0 here); eval n-gram set broadcast, training side "
    "map-only — the 100 TB corpus never shuffles to find hits",
    oracle="""
WITH norm AS (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                        ' ') AS w
    FROM documents
), g AS (
    SELECT doc_id,
           unnest(list_distinct(
               CASE WHEN len(w) < 8 THEN []
                    ELSE list_transform(range(1, len(w) - 6),
                         i -> array_to_string(w[i:i+7], ' ')) END)) AS gram
    FROM norm
), bg AS (
    SELECT DISTINCT gram FROM g WHERE doc_id % 41 = 0
), hits AS (
    SELECT g.doc_id, COUNT(*) AS n_hits
    FROM g JOIN bg USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
)
def decontaminate_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.decontam import ngram_decontaminate

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0)
    return ngram_decontaminate(d, bench, "text", "doc_id", n=8)


@register(
    "paragraph_dedup",
    doc="CCNet-style paragraph-level exact dedup: global keep-first per "
    "paragraph (min (doc_id, pos)), docs reassembled in original order; "
    "winner via map-side-combinable min-struct aggregate (NOT a "
    "row_number window, which single-tasks hot boilerplate paragraphs)",
    oracle="""
WITH p AS (
    SELECT doc_id,
           unnest(string_split(replace(text, ' the ', chr(10)), chr(10)))
               AS para,
           generate_subscripts(
               string_split(replace(text, ' the ', chr(10)), chr(10)), 1)
               AS pos
    FROM documents
), k AS (
    SELECT doc_id, para, pos,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1
               AS kept
    FROM p
)
SELECT doc_id,
       COUNT(*) AS n_paras,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(string_agg(para, chr(10) ORDER BY pos)
                    FILTER (WHERE kept), '') AS text_dedup
FROM k GROUP BY doc_id
""",
)
def paragraph_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_paragraphs

    # The synthetic corpus has no newlines; derive paragraph breaks
    # deterministically (identical literal replace in both engines).
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text")
    )
    return dedup_paragraphs(d, "text", "doc_id", "\n")


@register(
    "repetition_stats",
    doc="Gopher-style within-doc repetition signals: top-bigram and "
    "duplicate-bigram character coverage fractions; two map-side-"
    "combinable aggregates on doc-local keys, no joins/windows/Python",
    oracle="""
WITH norm AS (
    SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
    FROM documents
), w AS (
    SELECT doc_id, length(t) AS n_chars, string_split(t, ' ') AS ws FROM norm
), g AS (
    SELECT doc_id, n_chars,
           unnest(CASE WHEN len(ws) < 2 THEN [NULL]
                       ELSE list_transform(range(1, len(ws)),
                            i -> array_to_string(ws[i:i+1], ' ')) END) AS gram
    FROM w
), c AS (
    SELECT doc_id, n_chars, gram, COUNT(*) AS cnt
    FROM g GROUP BY doc_id, n_chars, gram
)
SELECT doc_id, n_chars,
       COALESCE(MAX(CASE WHEN gram IS NOT NULL
                         THEN cnt * length(gram) END), 0) * 1.0 / n_chars
           AS top_ngram_char_frac,
       COALESCE(SUM(CASE WHEN cnt >= 2
                         THEN cnt * length(gram) END), 0) * 1.0 / n_chars
           AS dup_ngram_char_frac
FROM c GROUP BY doc_id, n_chars
""",
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d, "text", "doc_id", n=2)


@register(
    "quality_model_score",
    doc="linear quality model scored as pure columnar math (the "
    "fasttext-classifier-filter shape with the model baked to fixed "
    "weights): logit = w·[alpha_ratio, stopword_ratio, "
    "avg_token_len/10, ln(1+n_tokens)/10] + b, sigmoid'd and rounded "
    "— model inference over 100 TB as one codegen'd projection, no "
    "UDF, no model server; keep-decision at 0.5.  Both engines "
    "compute identical IEEE doubles through exp/ln, rounded at 1e-6",
    oracle="""
WITH feats AS (
    SELECT doc_id,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
               / length(text) AS f_alpha,
           len(list_intersect(
                   list_distinct(string_split(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' ')),
                   ['the','a','of','and','to','in','is','that'])) * 1.0
               / len(string_split(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     ' ')) AS f_stop,
           (length(text) * 1.0
               / len(string_split(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     ' '))) * 0.1 AS f_len,
           ln(1 + len(string_split(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' '))) * 0.1 AS f_ntok
    FROM documents
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-(2.0 * f_alpha + 3.0 * f_stop
                                - 0.5 * f_len + 1.0 * f_ntok - 1.0))),
             6) AS quality,
       (1.0 / (1.0 + exp(-(2.0 * f_alpha + 3.0 * f_stop
                           - 0.5 * f_len + 1.0 * f_ntok - 1.0)))) >= 0.5
           AS keep
FROM feats
""",
)
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textstats import quality_score_exprs

    d = load_table(spark, sf_dir, "documents")
    ex = quality_score_exprs(F.col("text"))
    logit = (
        2.0 * ex["alpha_ratio"]
        + 3.0 * ex["stopword_ratio"]
        - 0.5 * (ex["avg_token_len"] * 0.1)
        + 1.0 * (F.log(1 + ex["n_tokens"]) * 0.1)
        - 1.0
    )
    prob = 1.0 / (1.0 + F.exp(-logit))
    return d.select(
        "doc_id",
        F.round(prob, 6).alias("quality"),
        (prob >= 0.5).alias("keep"),
    )


# --- round-8 queue registrations: BPE training + ExactSubstr spans -----------


from ..operators.bpe import bpe_portable_oracle, bpe_train  # noqa: E402
from ..operators.substring import (  # noqa: E402
    substring_dedup_spans as _substr_spans,
)
from ..operators.substring import substring_spans_oracle  # noqa: E402


@register(
    "bpe_train_portable",
    doc="distributed BPE tokenizer training (operators/bpe.py): 8 "
    "merge rounds over the word-frequency table — each round is one "
    "map-side-combined pair-count aggregate + a codegen'd fixpoint "
    "merge expression over the (word, freq) vocab (vocab-sized, NOT "
    "corpus-sized, after the first aggregation); ties break "
    "(count desc, lhs, rhs).  Oracle is EMITTED by "
    "bpe_portable_oracle — one (pairs, best, apply) CTE block per "
    "merge from the same parameters (queued r7, fuzzed in "
    "tools/fuzz_portables.py `bpe`)",
    oracle=bpe_portable_oracle(n_merges=8),
)
def bpe_train_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(load_table(spark, sf_dir, "documents"), n_merges=8)


@register(
    "substring_dedup_spans",
    doc="ExactSubstr-style duplicated-substring removal spans "
    "(operators/substring.py, after Lee et al. 2022 'Deduplicating "
    "Training Data Makes Language Models Better'): token 8-gram "
    "hashes counted corpus-wide (map-side combine, min_count=2), "
    "duplicate occurrences merged into maximal per-doc token spans "
    "via one gaps-and-islands window — no cartesian, plan-asserted "
    "in tests/test_plans_queued.py.  Oracle is EMITTED by "
    "substring_spans_oracle from the same parameters (queued r7, "
    "fuzzed in tools/fuzz_portables.py `substring`)",
    oracle=substring_spans_oracle(n=8, min_count=2),
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = _substr_spans(load_table(spark, sf_dir, "documents"), n=8)
    # token positions are int32 Spark-side; DuckDB generate_series
    # emits BIGINT — align the gate dtypes
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )
