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
from pyspark.sql import DataFrame, Window

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
    # ONE corpus scan (r13 optimization; previously three — the two
    # unigram join branches each re-tokenized the corpus): every
    # token emits a (w, NULL) unigram marker next to the (w1, w2)
    # bigrams, one grouped count collapses corpus → vocab, and the
    # VOCAB-SIZED count table is persisted so its two branches
    # (unigram lookups, bigram rows) never recompute the corpus
    # lineage — the dsir precedent of pinning a small integer-lane
    # aggregate, orders of magnitude under the raw text.
    # sequence(1, size-1) flips direction when size < 2 — the if()
    # guards it.
    from pyspark.storagelevel import StorageLevel

    from .dedup import spread

    # spread: the regex tokenize must not single-task on a single-
    # row-group input (no-op at scale — see dedup.spread)
    rows = spread(docs).select(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
        ).alias("_t")
    ).select(
        F.explode(
            F.expr(
                "concat("
                " transform(_t, w ->"
                "   struct(w AS w1, CAST(NULL AS STRING) AS w2)),"
                " if(size(_t) >= 2,"
                "    transform(sequence(1, size(_t) - 1),"
                "      i -> struct(_t[i-1] AS w1, _t[i] AS w2)),"
                "    array()))"
            )
        ).alias("_p")
    ).select("_p.w1", "_p.w2")
    counts = (
        rows.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    big = counts.filter(
        F.col("w2").isNotNull() & (F.col("c") >= min_count)
    ).select("w1", "w2", F.col("c").alias("c_ab"))
    uni = counts.filter(F.col("w2").isNull()).select("w1", "c")
    # vocab-sized sides: let AQE broadcast; keys renamed pre-join so
    # the plan stays unambiguous under self-join of `uni`
    ua = uni.select("w1", F.col("c").alias("c_a"))
    ub = uni.select(F.col("w1").alias("w2"), F.col("c").alias("c_b"))
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


def bigram_fluency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document fluency score from the corpus's own bigram
    statistics — the language-model quality proxy of the public
    pretraining-curation recipes (word salad scores low because its
    adjacent pairs are rare GIVEN their prefix; fluent text repeats
    the corpus's conditional structure).  No trained model, no logs:
    the per-bigram signal is the conditional-probability integer lane

        lane(a, b) = (scale · c_ab) DIV c_a      ∈ [0, scale]

    and the document score is the mean lane over its bigrams,

        fluency_lane = sum(lane) DIV n_bigrams

    both pure BIGINT (staged divisions replayed verbatim by the
    generated oracle, so cross-engine bit-equality holds by
    construction).  Overflow: scale·c_ab < 2^63 needs c_ab <
    9.2·10^12 at the default scale — beyond any realistic single
    bigram count; the guard documents rather than scans.

    Scale shape: tokenize once; corpus bigram/unigram counts are the
    same two vocab-sized grouped counts as :func:`dice_collocations`;
    the one corpus-sized join (doc-bigrams ⋈ bigram-lane table)
    shuffles on (w1, w2) — the lane table is far smaller than the
    corpus and AQE broadcasts it when it fits.  Docs with < 2 tokens
    have no bigrams and are absent from the output (score undefined).

    Returns ``id_col, n_bigrams, fluency_lane`` (BIGINT).
    """
    if not (0 < scale <= 1_000_000_000):
        raise ValueError(f"scale must be in (0, 1e9]: {scale}")
    # ONE corpus scan (r13 optimization; previously three — the
    # doc-bigram lineage fed both the lane build and the per-doc
    # join, and the unigram branch re-tokenized a third time): every
    # token emits a (w, NULL) unigram marker (NULL doc — markers
    # never reach the per-doc aggregate), bigrams emit (id, w1, w2);
    # c_ab and c_a are WINDOW counts over the bigram / prefix
    # partitions, so the lane arithmetic runs in-stream with zero
    # joins.  sequence(1, size-1) flips direction when size < 2 —
    # the if() guards it.
    from .dedup import spread

    # spread: same single-row-group guard as dice_collocations
    rows = spread(docs).select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
        ).alias("_t"),
    ).select(
        F.explode(
            F.expr(
                f"concat("
                f" transform(_t, w -> struct("
                f"   {id_col} AS _id,"
                f"   w AS w1, CAST(NULL AS STRING) AS w2)),"
                f" if(size(_t) >= 2,"
                f"    transform(sequence(1, size(_t) - 1),"
                f"      i -> struct({id_col} AS _id,"
                f"                  _t[i-1] AS w1, _t[i] AS w2)),"
                f"    array()))"
            )
        ).alias("_p")
    ).select("_p._id", "_p.w1", "_p.w2")
    scored = (
        rows.withColumn(
            "c_a",
            F.count(F.when(F.col("w2").isNull(), True)).over(
                Window.partitionBy("w1")
            ),
        )
        .filter(F.col("w2").isNotNull())
        .withColumn(
            "c_ab",
            F.count(F.lit(1)).over(Window.partitionBy("w1", "w2")),
        )
        .withColumn(
            "_lane", F.expr(f"({int(scale)} * c_ab) DIV c_a")
        )
    )
    return (
        scored.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(_lane) DIV count(1)").alias("fluency_lane"),
        )
    )


def bigram_fluency_oracle(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> str:
    """Mechanically generate the DuckDB SQL replaying
    :func:`bigram_fluency` over ``source_sql`` (a subquery producing
    ``id_col, text_col``)."""
    return f"""WITH src AS ({source_sql}), toks AS (
    SELECT {id_col} AS id,
           regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}') AS t
    FROM src
), doc_bigrams AS (
    SELECT id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT id, t, UNNEST(range(1, len(t))) AS i FROM toks
          WHERE len(t) >= 2)
), uni AS (
    SELECT w1, COUNT(*) AS c_a
    FROM (SELECT UNNEST(t) AS w1 FROM toks)
    GROUP BY w1
), lanes AS (
    SELECT b.w1, b.w2, ({int(scale)} * COUNT(*)) // ANY_VALUE(u.c_a) AS lane
    FROM doc_bigrams b JOIN uni u ON b.w1 = u.w1
    GROUP BY b.w1, b.w2
)
SELECT db.id AS {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(l.lane) // COUNT(*) AS BIGINT) AS fluency_lane
FROM doc_bigrams db
JOIN lanes l ON db.w1 = l.w1 AND db.w2 = l.w2
GROUP BY db.id"""
