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
        # NULL text must SURVIVE with NULL rolling_min in both forms
        # (Spark's greatest() skips NULLs so the window sequence stays
        # non-empty; the r7 ADVICE divergence scenario) — and in the
        # DuckDB oracle, pinned below
        (6, None),
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
        # NULL-text row kept in both forms; md5(NULL) is NULL while
        # xxhash64(NULL) is the seed hash (42) — both self-consistent
        assert 6 in df_form
        if algo == "md5":
            assert df_form[6] is None


def test_rolling_min_null_text_matches_duckdb_oracle(spark):
    """All three computations of the rolling fingerprint — the
    expression form, the corpus-pass form, and the registered DuckDB
    oracle shape — must emit a NULL-text document as a surviving row
    with NULL rolling_min (a dropped row would flip the driver's
    row-count gate if a NULL text ever entered the corpus)."""
    import duckdb

    from survivor_processing_spark.functions.textstats import (
        rolling_min_by_doc,
    )

    df = spark.createDataFrame(
        [(1, "hello world text"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["rolling_min"]
        for r in rolling_min_by_doc(
            df, "text", "doc_id", window=8, algo="md5"
        ).collect()
    }
    want = dict(
        duckdb.connect()
        .execute(
            """SELECT doc_id, list_min(list_transform(
                 range(1, greatest(length(text) - 7, 1) + 1),
                 i -> md5(substring(text, CAST(i AS INTEGER), 8))))
               FROM (VALUES (1, 'hello world text'), (2, NULL))
                    t(doc_id, text)"""
        )
        .fetchall()
    )
    assert got == want and got[2] is None
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
