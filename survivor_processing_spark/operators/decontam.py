"""Benchmark decontamination: drop/flag training documents that
overlap an evaluation set by at least one word n-gram.

This is the published pretraining-hygiene step (the GPT-3 appendix
describes a 13-gram filter; PaLM/Llama report similar n-gram
overlap filters) — the reference engine has no analog, but any
100 TB training-data pipeline needs it, so it is first-class here.

Spark-first shape, and why it scales:

* The benchmark side is SMALL by nature (eval sets are MBs, not TBs).
  Its distinct n-gram set is built once and **broadcast** — the
  100 TB training side never shuffles to discover hits: the
  explode → broadcast-hash-semi-join runs map-side inside the scan
  stage.
* Only HIT rows (rare by construction — contamination is the
  exception) flow into the per-doc count aggregation, with map-side
  partial aggregation on ``doc_id``.
* The per-doc verdict joins the (tiny) hit table back to the corpus
  with a second broadcast, so the whole operator is one map-side
  pass over the training corpus plus two broadcasts.  If a corpus
  were adversarially contaminated (hit table no longer small), Spark
  falls back to a shuffle join under AQE — correctness unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup import ngrams_from_words, tokens_expr


def _gram_table(
    df: DataFrame, text_col: str, id_col: str | None, n: int
) -> DataFrame:
    """(doc_id?, gram) — distinct word n-grams per document, strict
    semantics: a document with fewer than ``n`` words emits none."""
    cols = ([F.col(id_col).alias("doc_id")] if id_col else []) + [
        tokens_expr(text_col).alias("_w")
    ]
    out = df.select(*cols).select(
        *(["doc_id"] if id_col else []),
        F.explode(ngrams_from_words("_w", n, distinct=True)).alias("gram"),
    )
    return out


def ngram_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Flag every training document whose normalized text shares at
    least ``min_hits`` distinct word ``n``-grams with the benchmark
    corpus.

    Returns (id_col, n_hits, contaminated) for EVERY input document —
    callers filter ``~contaminated`` to decontaminate, or keep the
    audit columns for a dataset card.  ``n_hits`` counts distinct
    contaminated n-grams, so it is stable under document length.
    """
    bench_grams = _gram_table(
        bench, bench_text_col or text_col, None, n
    ).distinct()
    doc_grams = _gram_table(docs, text_col, id_col, n)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )
