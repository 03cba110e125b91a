"""DSIR-style data selection: hashed n-gram importance weights.

Public method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" — DSIR): score every RAW document by how
much its hashed bag-of-n-grams looks like a TARGET corpus relative
to the raw corpus itself, then keep the top slice (or
Gumbel-resample) — the standard recipe for tilting a web-scale crawl
toward a high-quality distribution (Wikipedia/books-like) before
pretraining.  The reference repo has no analog; this is part of the
LLM-data-pipeline layer the engine adds on top of SURVEY §2.

Exactness contract (the repo's integer-lane discipline): DSIR's
log-ratio sum is replaced by an exact RATIONAL ratio lane —

    bucket(g)   = md5-prefix-60bit(g) % n_buckets
    r[b]        = least((p[b] + 1) * scale DIV (q[b] + 1), scale * cap)
    weight_lane = sum over the doc's grams of r[bucket(g)]
    score_lane  = weight_lane DIV n_grams

with p = target bucket counts, q = raw bucket counts (add-1
smoothed).  Monotone in the per-bucket target/raw ratio like the
log-ratio score, but every step is integer arithmetic both engines
replay bit-for-bit (Spark ``DIV`` == DuckDB ``//`` on non-negative
lanes; md5 is the portable hash — the same lane trick as
operators/fingerprint.py).  ``cap`` bounds a single bucket's ratio
(a bucket far beyond cap× enrichment is hash noise, and the bound
gives BIGINT headroom: weight ≤ n_grams · scale · cap ≤ 10⁵·10⁶·10³
= 10¹⁴ per document, four decades under 2⁶³).

Scale shape: two map-side-combined bucket aggregates (outputs ≤
n_buckets rows each — broadcastable by construction), one per-doc
(doc, bucket) aggregate, one BROADCAST join against the lane table,
one per-doc sum.  No window, no driver loop; the lane table is the
only state and it is O(n_buckets) regardless of corpus size, which
is exactly why DSIR's hashed features scale to 100 TB where raw
vocabulary statistics do not.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .dedup import ngrams_from_words, spread, tokens_expr


def _grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # spread: the tokenize+gram projection must not single-task on an
    # unsplittable single-row-group input (no-op at scale — see
    # dedup.spread)
    return (
        spread(df).select(
            F.col(id_col).alias("doc_id"),
            tokens_expr(text_col).alias("_w"),
        )
        .select("doc_id", F.explode(ngrams_from_words("_w", n)).alias("g"))
    )


def _bucket_expr(n_buckets: int) -> str:
    # md5-prefix 60-bit lane % n_buckets — portable (fingerprint.py)
    return (
        "pmod(cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint),"
        f" {int(n_buckets)})"
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 4096,
    scale: int = 1_000_000,
    ratio_cap: int = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Per-RAW-document DSIR importance lanes against ``target``.

    Returns ``doc_id, n_grams, weight_lane, score_lane`` for EVERY
    raw document (docs shorter than ``n`` words emit ``n_grams = 0``
    with NULL lanes — nothing to weigh is not weight zero, matching
    ngram_coverage_score's short-doc convention).  ``score_lane`` is
    the length-normalized selection key: rank raw docs by it
    descending and keep the top slice.  Oracle:
    :func:`dsir_importance_oracle` from the same constants.

    ``materialize=True`` persists the per-(doc, bucket) counts so
    the raw corpus tokenizes ONCE (see the inline comment); the
    cache entry lives until the session drops it — one entry per
    distinct invocation plan, so callers looping over many SMALL
    corpora (fuzz harnesses, unit sweeps) should pass
    ``materialize=False`` and accept the second tokenize pass
    instead of accumulating session-lifetime cache entries."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if scale < 1 or ratio_cap < 1:
        raise ValueError("scale and ratio_cap must be >= 1")
    b = _bucket_expr(n_buckets)
    raw_g = _grams(raw, text_col, id_col, n).withColumn("b", F.expr(b))
    tgt_g = _grams(target, text_col, id_col, n).withColumn("b", F.expr(b))
    # ONE pass over the raw corpus (the 100 TB side): the per-doc
    # bucket counts are aggregated first, and the corpus-wide bucket
    # totals derive from THEM — aggregating q from raw_g directly
    # would tokenize, explode, and md5 the whole corpus a second
    # time.  The derivation only holds if cnt is MATERIALIZED: its
    # subtree feeds two consumers (the q aggregate and the per_doc
    # join) and Spark recomputes un-cached lineage per branch — the
    # two branches even canonicalize differently (a join-side
    # isnotnull), so ReusedExchange never fires (ADVICE r12).
    # persist() pins it: integer-only (doc, bucket, cnt) rows, orders
    # of magnitude under the raw text, MEMORY_AND_DISK spills at
    # scale; the plan audit asserts the single text scan.
    cnt = raw_g.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cnt"))
    if materialize:
        cnt = cnt.persist(StorageLevel.MEMORY_AND_DISK)
    q = cnt.groupBy("b").agg(F.sum("cnt").cast("bigint").alias("q"))
    p = tgt_g.groupBy("b").agg(F.count(F.lit(1)).alias("p"))
    # every bucket a raw doc references has a q row by construction;
    # buckets the target never hit smooth to p = 0
    lane = (
        q.join(p, "b", "left")
        .select(
            "b",
            F.expr(
                f"least(((coalesce(p, 0) + 1) * {int(scale)})"
                f" DIV (q + 1), {int(scale) * int(ratio_cap)})"
            ).alias("r"),
        )
    )
    per_doc = (
        cnt.join(F.broadcast(lane), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("r")).cast("bigint").alias(
                "weight_lane"
            ),
        )
        .withColumn(
            "score_lane", F.expr("weight_lane DIV n_grams")
        )
    )
    return (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.col("weight_lane").cast("bigint").alias("weight_lane"),
            F.col("score_lane").cast("bigint").alias("score_lane"),
        )
    )


def dsir_importance_oracle(
    raw_sql: str,
    target_sql: str,
    n: int = 2,
    n_buckets: int = 4096,
    scale: int = 1_000_000,
    ratio_cap: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`dsir_importance_weights` from the same parameters
    (``raw_sql``/``target_sql`` are subqueries producing
    ``id_col, text_col``)."""
    bucket = (
        "CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)"
        f" % {int(n_buckets)}"
    )

    def grams(src: str, name: str) -> str:
        return f"""{name}_w AS (
    SELECT {id_col} AS doc_id,
           string_split(regexp_replace(lower(trim({text_col})),
                                       '\\s+', ' ', 'g'), ' ') AS words
    FROM ({src})
), {name}_g AS (
    SELECT doc_id, {bucket.replace('md5(g)', f"md5(array_to_string(words[i:i+{n - 1}], ' '))")} AS b
    FROM {name}_w, LATERAL (
        SELECT unnest(generate_series(1, len(words) - {n - 1})) AS i
    )
    WHERE len(words) >= {n}
)"""

    return f"""WITH {grams(raw_sql, 'raw')}, {grams(target_sql, 'tgt')},
q AS (SELECT b, COUNT(*) AS q FROM raw_g GROUP BY b),
p AS (SELECT b, COUNT(*) AS p FROM tgt_g GROUP BY b),
lane AS (
    SELECT q.b,
           LEAST(((COALESCE(p.p, 0) + 1) * {int(scale)}) // (q.q + 1),
                 {int(scale) * int(ratio_cap)}) AS r
    FROM q LEFT JOIN p ON p.b = q.b
),
cnt AS (SELECT doc_id, b, COUNT(*) AS cnt FROM raw_g GROUP BY doc_id, b),
per_doc AS (
    SELECT c.doc_id,
           CAST(SUM(c.cnt) AS BIGINT) AS n_grams,
           CAST(SUM(c.cnt * l.r) AS BIGINT) AS weight_lane
    FROM cnt c JOIN lane l ON l.b = c.b
    GROUP BY c.doc_id
)
SELECT d.{id_col} AS doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       p.weight_lane,
       CAST(p.weight_lane // p.n_grams AS BIGINT) AS score_lane
FROM ({raw_sql}) d LEFT JOIN per_doc p ON p.doc_id = d.{id_col}"""
