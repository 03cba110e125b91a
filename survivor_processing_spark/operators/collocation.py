"""Collocation mining: corpus-level bigram association scores for
phrase detection — the word2phrase step of a pretraining text
pipeline (joining "new york" into one token before BPE training
measurably improves tokenizer fertility; the public word2vec
phrase-mining recipe is exactly a thresholded bigram association
score).  The reference pipeline tokenizes text ad hoc
(survivor_processing's scraping notebooks split on whitespace); this
is the corpus-statistics extension alongside the tf-idf and BPE
families (q:tfidf_vocab, operators/bpe.py).

Portability (MEMORY's portable-oracle playbook): the association
score is the Dice coefficient in INTEGER lanes —

    dice_lane = (2 · scale · c_ab) DIV (c_a + c_b)

one BIGINT multiply + one integer division on exact corpus counts,
bit-equal in any engine (Spark ``DIV`` and DuckDB ``//`` both
truncate; all operands non-negative).  Dice is the bounded-ratio
member of the collocation family (PMI's log and its N²/B numerator
either leave integers or overflow BIGINT at web scale; Dice stays
below 2·scale by construction, so scale up to 10^9 is always safe:
2·10^9·c_ab < 2^63 for any c_ab < 4.6·10^9 — a single bigram PAIR
occurring 4.6 billion times — and the raw counts ship alongside so
any downstream measure can be recomputed).

Scale shape: tokenize once (one projection, codegen regexp), then
two grouped counts — unigrams and adjacent bigrams — each ONE
shuffle with map-side combine on what is a vocabulary-sized (not
corpus-sized) result.  The two unigram joins onto the bigram table
are joins of vocab-sized tables; at 100 TB the vocabulary still fits
the broadcast threshold after the ``min_count`` prefilter, and AQE
picks BHJ at runtime.  No Python runs anywhere — the whole plan is
codegen'd JVM expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOKEN_PATTERN = "[a-z0-9]+"


def dice_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Corpus bigram Dice association over ``docs[text_col]``.

    Tokens are maximal ``[a-z0-9]+`` runs of the lowercased text
    (bit-identical in Java regex and RE2 — the pattern uses only a
    literal character class); bigrams are adjacent token pairs
    WITHIN a document (never across document boundaries).  Returns
    ``w1, w2, c_ab, c_a, c_b, dice_lane`` (counts and lanes BIGINT,
    lanes in units of 1/scale) for pairs with ``c_ab >= min_count``.
    """
    if not (0 < scale <= 1_000_000_000):
        raise ValueError(f"scale must be in (0, 1e9]: {scale}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    toks = docs.select(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
        ).alias("_t")
    )
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # sequence(1, size-1) flips direction when size < 2 — guard first
    big = (
        toks.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1),"
                    " i -> struct(_t[i-1] AS w1, _t[i] AS w2))"
                )
            ).alias("_p")
        )
        .groupBy(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    # vocab-sized sides: let AQE broadcast; keys renamed pre-join so
    # the plan stays unambiguous under self-join of `uni`
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        big.join(ua, "w1")
        .join(ub, "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(f"(2 * {int(scale)} * c_ab) DIV (c_a + c_b)").alias(
                "dice_lane"
            ),
        )
    )


def dice_collocations_oracle(
    source_sql: str,
    text_col: str = "text",
    min_count: int = 2,
    scale: int = 1_000_000_000,
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`dice_collocations` over ``source_sql`` (a subquery
    producing ``text_col``) — same tokenization, same integer
    division, same thresholds."""
    return f"""WITH src AS ({source_sql}), toks AS (
    SELECT regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS t
    FROM src
), uni AS (
    SELECT w, COUNT(*) AS c
    FROM (SELECT UNNEST(t) AS w FROM toks)
    GROUP BY w
), big AS (
    SELECT w1, w2, COUNT(*) AS c_ab FROM (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM toks
              WHERE len(t) >= 2)
    )
    GROUP BY w1, w2
    HAVING COUNT(*) >= {int(min_count)}
)
SELECT b.w1, b.w2, b.c_ab,
       ua.c AS c_a, ub.c AS c_b,
       (2 * {int(scale)} * b.c_ab) // (ua.c + ub.c) AS dice_lane
FROM big b
JOIN uni ua ON b.w1 = ua.w
JOIN uni ub ON b.w2 = ub.w"""
