"""Unit tests for text-analysis expressions (BPE-ish subword count,
rolling-hash fingerprint modes)."""

from __future__ import annotations

import pyspark.sql.functions as F

from survivor_processing_spark.functions.textstats import (
    rolling_hash_expr,
    subword_count_expr,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("v"))
        .first()["v"]
    )


def test_subword_count_splits_punct_and_runs(spark):
    # "don't stop-me now!" -> don ' t stop - me now !  = 8 subwords
    assert _one(spark, "don't stop-me now!", subword_count_expr("text")) == 8
    assert _one(spark, "abc", subword_count_expr("text")) == 1


def test_rolling_hash_short_doc_single_window(spark):
    # len < window -> greatest(...) clamps to one window = whole text
    h_short = _one(spark, "abc", rolling_hash_expr("text", window=8))
    h_same = _one(spark, "abc", rolling_hash_expr("text", window=8))
    assert h_short == h_same is not None


def test_rolling_hash_min_monotone_under_extension(spark):
    # windows(doc) ⊆ windows(doc+suffix) -> min can only stay or drop
    base = "the quick brown fox jumps over the lazy dog"
    h1 = _one(spark, base, rolling_hash_expr("text", window=8))
    h2 = _one(spark, base + " again and again", rolling_hash_expr("text", window=8))
    assert h2 <= h1


def test_rolling_hash_md5_mode_matches_manual(spark):
    import hashlib

    text = "abcdefghij"  # windows: abcdefgh, bcdefghi, cdefghij
    expect = min(
        hashlib.md5(text[i : i + 8].encode()).hexdigest() for i in range(3)
    )
    assert _one(spark, text, rolling_hash_expr("text", window=8, algo="md5")) == expect


def test_rolling_min_by_doc_matches_expression_form(spark):
    """The codegen'd corpus-pass form must be bit-identical to the
    per-row expression form, in both hash modes, including the
    short-doc clamp and carry_cols plumbing."""
    from survivor_processing_spark.functions.textstats import (
        rolling_min_by_doc,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abc"),  # shorter than the window -> single clamped window
        (3, "abcdefghij"),
        (4, "the the the the the the the the the"),
        (5, ""),  # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for algo in ("md5", "xxhash64"):
        expr_form = {
            r["doc_id"]: r["v"]
            for r in df.select(
                "doc_id",
                rolling_hash_expr("text", window=8, algo=algo).alias("v"),
            ).collect()
        }
        df_form = {
            r["doc_id"]: r["rolling_min"]
            for r in rolling_min_by_doc(
                df, "text", "doc_id", window=8, algo=algo
            ).collect()
        }
        assert df_form == expr_form
    carried = {
        r["doc_id"]: r["n_sub"]
        for r in rolling_min_by_doc(
            df,
            "text",
            "doc_id",
            window=8,
            algo="md5",
            carry_cols=(subword_count_expr("text").alias("n_sub"),),
        ).collect()
    }
    expect = {
        r["doc_id"]: r["n_sub"]
        for r in df.select(
            "doc_id", subword_count_expr("text").alias("n_sub")
        ).collect()
    }
    assert carried == expect
