"""Text-analysis column expressions for corpus pipelines.

Language-ID (stopword-profile heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace +
BPE-ish regex), and document fingerprinting.  All built-in SQL
expressions — they run inside whole-stage codegen on every executor;
nothing touches Python at runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# Tiny stopword profiles; enough for a deterministic heuristic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "ein", "ist", "nicht"],
}


def _tokens(col):
    return F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")


def token_count_expr(col):
    """Whitespace token count."""
    return F.size(_tokens(col))


def subword_count_expr(col_name: str):
    """BPE-ish subword proxy: count alnum runs + standalone
    punctuation marks (a cheap, deterministic token-count estimate).
    Takes a column *name* (used inside a SQL expression)."""
    return F.size(
        F.expr(
            f"filter(split(regexp_replace(lower({col_name}),"
            f" '([^a-z0-9\\\\s])', ' $1 '), '\\\\s+'), x -> x != '')"
        )
    )


def quality_score_exprs(col) -> dict:
    """Quality-signal columns: n_chars, n_tokens, avg token length,
    alpha ratio, stopword ratio, and a composite score.  Single
    divisions of small ints → bit-identical across engines."""
    toks = _tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in LANG_PROFILES["en"]]),
        )
    )
    alpha_ratio = alpha_chars / n_chars
    avg_token_len = n_chars / n_tokens
    stop_ratio = stop_hits / n_tokens
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
    }


def lang_id_expr(col):
    """Stopword-profile language guess with deterministic tie order
    (en > es > de)."""
    distinct = F.array_distinct(_tokens(col))
    scores = {
        lang: F.size(
            F.array_intersect(distinct, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_PROFILES.items()
    }
    return (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]), "en"
        )
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )


def fingerprint_expr(col):
    """Locale-stable document fingerprint: md5 of the sorted distinct
    token set (the classic key-collision fingerprint)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(col))))
    )


def rolling_hash_expr(col, window: int = 8, algo: str = "xxhash64"):
    """Content-defined rolling fingerprint: min hash over character
    n-gram windows (winnowing-style document sketch).

    ``algo='xxhash64'`` (default) is the scale path — fixed-width
    64-bit lanes, whole-stage codegen.  ``algo='md5'`` takes the
    lexicographic min of hex digests instead: slower, but md5 is
    implemented identically in every engine, so results can be
    hash-checked cross-engine (the DuckDB oracle uses it).

    This is the per-ROW expression form (one doc at a time, handy in
    composed expressions and tests).  The lambda body runs
    INTERPRETED per character position; for a whole-corpus pass use
    :func:`rolling_min_by_doc`, which hashes in whole-stage codegen
    (22.7 s → 2.6 s on the 10x fixture, identical output)."""
    if algo == "xxhash64":
        h = f"xxhash64(substring({col}, i, {window}))"
    elif algo == "md5":
        h = f"md5(substring({col}, i, {window}))"
    else:
        raise ValueError(f"unknown rolling-hash algo: {algo}")
    return F.expr(
        f"array_min(transform("
        f" sequence(1, greatest(length({col}) - {window - 1}, 1)),"
        f" i -> {h}))"
    )


def rolling_min_by_doc(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    algo: str = "xxhash64",
    carry_cols: tuple = (),
):
    """Corpus-wide :func:`rolling_hash_expr`, restructured for scale:
    explode ONLY the window-start sequence, hash at row level (the
    per-position md5/xxhash64 runs in whole-stage codegen instead of
    an interpreted ``transform`` lambda), and take the per-document
    min with a hash aggregate — ``min`` is algebraic, so the map-side
    partial combine collapses every partition to one row per doc
    before the shuffle.  ``carry_cols`` are per-document aliased Column expressions
    to evaluate BEFORE the explode and carry through the aggregation
    as grouping keys (cheaper than a second scan + join).

    Returns ``id_col, rolling_min, *carry_cols``.  Output is
    bit-identical to the expression form (pinned by a test),
    INCLUDING NULL text: ``greatest(NULL, 1)`` skips the NULL, so the
    window sequence is never empty and a NULL-text document survives
    as a row (rolling_min NULL in md5 mode, the seed hash in xxhash64
    mode — Spark hash functions hash NULL to the seed) — same as the
    expression form and the registered DuckDB oracle (pinned by
    test_rolling_min_null_text_matches_duckdb_oracle).  Measured
    22.7 s → 2.6 s on the 10x fixture for the md5 gate mode."""
    from ..operators.dedup import spread

    if algo == "xxhash64":
        h = F.expr(f"xxhash64(substring({text_col}, pos, {window}))")
    elif algo == "md5":
        h = F.md5(F.expr(f"substring({text_col}, pos, {window})"))
    else:
        raise ValueError(f"unknown rolling-hash algo: {algo}")
    base = spread(df).select(
        F.col(id_col),
        *carry_cols,
        F.col(text_col),
    )
    keep = [c for c in base.columns if c != text_col]
    rows = base.select(
        *keep,
        F.expr(
            f"explode(sequence(1,"
            f" greatest(length({text_col}) - {window - 1}, 1)))"
        ).alias("pos"),
        F.col(text_col),
    ).select(*keep, h.alias("_h"))
    return rows.groupBy(*keep).agg(F.min("_h").alias("rolling_min")).select(
        id_col, "rolling_min", *[c for c in keep if c != id_col]
    )
