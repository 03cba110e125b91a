"""LLM-data-pipeline TEXT ANALYSIS queries: quality scoring, language
ID, document fingerprints, length profiling.

Split from the former queries/llm.py (round 9, VERDICT r08 #6) —
pure file move, no semantic change; every @register block is
byte-identical to its pre-split form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_exprs,
    rolling_min_by_doc,
    subword_count_expr,
    token_count_expr,
)
from ._registry import register



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


# RETIRED r9 (paired with the q:content_fingerprint registration,
# VERDICT r08 #2): q:doc_fingerprint — md5-of-sorted-distinct-tokens
# per document + whitespace token count.  Carried by: the per-doc
# sketch-fingerprint family by q:rolling_fingerprint (winnowing
# rolling-hash min, same corpus pass), normalize-then-key exact
# identity by q:exact_dedup_docs (the production use of a document
# fingerprint), and table-level content equality by the new
# q:content_fingerprint (queries/etl.py -> operators/fingerprint.py,
# the multiset fingerprint production replays verify with).
# fingerprint_expr/token_count_expr stay pinned bit-for-bit in
# tests/test_textstats.py.  Accounting: ROTATION_r09.md.


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


# --- retrieval family (r11 registrations — VERDICT r10 #3) -----------------

from ..operators.retrieval import (  # noqa: E402
    bm25_doc_term_scores,
    bm25_scores_oracle,
    inverted_postings,
    inverted_postings_oracle,
)


@register(
    "inverted_postings",
    doc="inverted index build (operators/retrieval.py:92 — queued "
    "r7, registered r11 per VERDICT r10 #3): one tokenize+explode "
    "pass, a map-side-combined (doc, token) tf aggregate, stopword-"
    "class tokens cut by max_df on the document-frequency table "
    "BEFORE posting assembly (the heavy hitters are exactly the "
    "tokens whose postings dominate the shuffle and serve nothing), "
    "then one groupBy(token) assembling the posting list as the "
    "deterministic doc-sorted 'doc:tf' string.  The retrieval-based "
    "curation / hard-negative-mining entry point.  Oracle EMITTED by "
    "inverted_postings_oracle from the same parameters (fuzzed in "
    "tools/fuzz_portables.py `retrieval`)",
    oracle=inverted_postings_oracle(min_df=2, max_df=400),
)
def inverted_postings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_postings(
        load_table(spark, sf_dir, "documents"), min_df=2, max_df=400
    )


@register(
    "bm25_doc_term_scores",
    doc="per-(doc, term) BM25 weights for each document's top-3 "
    "terms (operators/retrieval.py:155 — queued r7, registered r11 "
    "per VERDICT r10 #3): tf saturation carried as an EXACT integer "
    "rational (BIGINT lanes, k1=6/5 b=3/4 multiplied through), the "
    "only floats are single fixed-association expressions (idf ln + "
    "one multiply) so both engines run the identical IEEE op "
    "sequence; ranking keys are exact (tf desc, df asc, token) — "
    "never a float.  Oracle EMITTED by bm25_scores_oracle from the "
    "same parameters (fuzzed in tools/fuzz_portables.py `retrieval`)",
    oracle=bm25_scores_oracle(),
)
def bm25_doc_term_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_doc_term_scores(load_table(spark, sf_dir, "documents"))


# --- r12 queue registrations (VERDICT r11 #1) --------------------------------

from ..operators.collocation import (  # noqa: E402
    bigram_fluency,
    bigram_fluency_oracle,
    dice_collocations,
    dice_collocations_oracle,
)

_DOCS_TEXT_SQL = "SELECT text FROM documents"
_DOCS_ID_TEXT_SQL = "SELECT doc_id, text FROM documents"


@register(
    "dice_collocations",
    doc="corpus bigram Dice association mining "
    "(operators/collocation.py dice_collocations — queued r10, "
    "registered r12 per VERDICT r11 #1): adjacent-pair counts over "
    "maximal [a-z0-9]+ tokens of the lowercased corpus, Dice = "
    "2·c_ab/(c_a+c_b) on an exact INTEGER lane (scaled DIV — "
    "engine-portable, no float association drift), min_count "
    "cutting the singleton tail.  Collocation strength is the "
    "phrase-detection signal pretraining tokenization and boilerplate "
    "analysis both consume (Manning & Schütze ch.5 is the public "
    "reference).  Plan: one explode for unigrams + one for adjacent "
    "pairs, both map-side combined; the unigram join-back is "
    "broadcast-size (vocabulary-bounded).  (fuzz family "
    "`collocation`; cross-engine tests tests/test_collocation.py; "
    "map-side/no-Python plan audit tests/test_plans_queued.py)",
    oracle=dice_collocations_oracle(_DOCS_TEXT_SQL, min_count=2),
)
def dice_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("text")
    return dice_collocations(d, min_count=2)


@register(
    "bigram_fluency",
    doc="per-document fluency score from the corpus's OWN bigram "
    "statistics (operators/collocation.py bigram_fluency — queued "
    "r10, registered r12 per VERDICT r11 #1): mean conditional "
    "bigram frequency P(w2|w1) per doc on an exact integer lane "
    "(scaled DIV of sums) — the model-free language-model quality "
    "proxy of the public curation recipes (word salad scores low "
    "because its adjacent pairs are rare GIVEN their prefix; fluent "
    "text repeats the corpus's transitions).  Complements "
    "q:ngram_coverage_score: coverage asks 'seen at all?', fluency "
    "asks 'how probable given the prefix?'.  Plan: bigram lanes are "
    "map-side combined, the per-doc join-back is on the "
    "vocabulary-bounded lane table.  (fuzz family `bigram_fluency`; "
    "cross-engine tests tests/test_bigram_fluency.py; plan audit "
    "tests/test_plans_queued.py)",
    oracle=bigram_fluency_oracle(_DOCS_ID_TEXT_SQL),
)
def bigram_fluency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_fluency(d)
