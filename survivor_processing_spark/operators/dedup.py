"""Deduplication operators for large-scale corpus processing.

Beyond the reference's surface (its dedup is ``drop_duplicates``,
reference contestant_transform.py:183 / confessional_transform.py:26-28),
these are the operators a 100 TB training-data pipeline needs:

* exact dedup — normalized-text hash groupBy;
* MinHash + LSH near-dup — shingle → k minhashes → b bands →
  band-bucket join → exact-Jaccard verification;
* SimHash — 64-bit signature, bucketed by 16-bit chunks;
* n-gram Jaccard — exact pairwise on a shingle-inverted index.

Everything is built-in SQL expressions (xxhash64, transform,
aggregate, explode): JVM-side, whole-stage-codegen'd, no Python in
the hot path.  Shuffles: one per groupBy/join on the *shingle/bucket*
keys — at 100 TB, bucket keys distribute uniformly by construction
(they are hashes), so no skew; candidate verification touches only
bucket-collision pairs, never the cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def normalize_text(col):
    """Lowercase, trim, collapse runs of whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens_expr(text_col: str):
    return F.split(normalize_text(F.col(text_col)), " ")


def shingles_expr(text_col: str, n: int = 3):
    """Distinct word n-gram shingles as an array column (pure SQL:
    transform over an index sequence + slice)."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(size(split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')) - {n - 1}, 1)),"
        f"  i -> concat_ws(' ', slice(split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' '), i, {n}))"
        f"))"
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized text; adds
    ``n_copies``.  One hash-aggregate shuffle on the text hash."""
    return (
        df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_norm"))
        .groupBy("_norm")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("_norm")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 64, shingle_n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per document.

    sig[j] = min over shingles of xxhash64(shingle, j) — the seeded
    hash family replaces explicit permutations.  Computed in one
    projection (no explode, no shuffle)."""
    sh = shingles_expr(text_col, shingle_n)
    return df.select(
        F.col(id_col).alias("doc_id"),
        sh.alias("shingles"),
    ).select(
        "doc_id",
        "shingles",
        F.expr(
            f"transform(sequence(0, {k - 1}),"
            f" j -> array_min(transform(shingles, s -> xxhash64(s, j))))"
        ).alias("sig"),
    )


def lsh_candidate_pairs(sig_df: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows`` hashes, bucket on (band_idx, hash(band slice)), emit
    distinct candidate pairs (id1 < id2) from bucket collisions.

    The self-join shuffles on the bucket hash — uniform by
    construction.  Output is candidates only; callers verify."""
    banded = sig_df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> xxhash64(slice(sig, b * {rows} + 1, {rows})))"
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sig_df: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs; keeps
    pairs >= threshold.  Joins only the candidate ids — at scale the
    shingle arrays ride along two broadcast-or-shuffle hash joins on
    doc_id, never a cross product."""
    s1 = sig_df.select(F.col("doc_id").alias("id1"), F.col("shingles").alias("sh1"))
    s2 = sig_df.select(F.col("doc_id").alias("id2"), F.col("shingles").alias("sh2"))
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            (
                F.size(F.array_intersect("sh1", "sh2"))
                / F.size(F.array_union("sh1", "sh2"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs, exact-verified."""
    sigs = minhash_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows=rows)
    return jaccard_verify(cands, sigs, threshold)


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float, shingle_n: int = 3
) -> DataFrame:
    """Exact all-pairs Jaccard via a shingle inverted index: explode
    distinct shingles, self-join on shingle (only docs *sharing* a
    shingle ever meet), count common, derive |union| from per-doc
    counts.  The shuffle key is the shingle — a natural inverted
    index; hot shingles (stopword n-grams) are the skew risk, which
    is why the MinHash path above is the default at scale."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles_expr(text_col, shingle_n).alias("sh")
    )
    counts = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2")
        )
        .agg(F.count("*").alias("n_common"))
    )
    c1 = counts.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(c1, "id1")
        .join(c2, "id2")
        .select(
            "id1",
            "id2",
            (
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document: per-bit ±1 votes over token
    hashes, sign → bit.  One projection, no shuffle."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        tokens_expr(text_col).alias("toks"),
    ).select(
        "doc_id",
        F.expr(
            "aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) -> acc + "
            " if(aggregate(toks, 0,"
            "     (s, t) -> s + if(bit_get(xxhash64(t), b) = 1, 1, -1)) > 0,"
            "    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
        ).alias("simhash64"),
    )


def simhash_near_pairs(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup candidates: bucket by each of four 16-bit
    chunks (any pair within hamming<=3-per-chunk-pigeonhole shares a
    chunk if distance <= 3×... — standard 4-chunk pigeonhole for
    d<=3; wider d needs more chunks), verify with popcount of XOR."""
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        "doc_id",
        "simhash64",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3),"
                " c -> cast(shiftright(simhash64, c * 16) & 65535 as int))"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("a.simhash64").alias("h1"),
            F.col("b.simhash64").alias("h2"),
        )
        .distinct()
    )
    return cands.select(
        "id1",
        "id2",
        F.expr("bit_count(h1 ^ h2)").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
