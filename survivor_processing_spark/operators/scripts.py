"""Unicode script-mix statistics — the script-composition curation
signal (queued r13).

A 100 TB crawl carries documents whose declared or detected language
disagrees with the characters actually on the page: Cyrillic spam
inside "English" domains, CJK boilerplate wrapped around Latin
payloads, mojibake runs, mixed-script confusable slugs.  Script
composition is the model-free signal for all of these (the fastText
language-ID recipe itself starts from character distributions), and
the standard curation stacks (CCNet, RefinedWeb) gate on it before
any classifier runs.  The reference repo scrapes a single-language
wiki and has no analog; this extends the lang-ID / quality family of
the LLM-pipeline layer.

Semantics: per document, exact per-script codepoint counts over
fixed public Unicode ranges (Latin incl. the Latin-1/Extended
letters minus × and ÷, Greek, Cyrillic, Hebrew, Arabic, Devanagari,
Han, Kana, Hangul), plus digits, whitespace, total length, the
letter total, the DOMINANT script (max letter count, ties broken by
the fixed table order, 'none' when the document has no letters), and
a ``mixed_script`` flag: at least 20 letters AND >= 10% of letters
outside the dominant script — both thresholds evaluated as
cross-multiplied integers, so every output is exact and
engine-portable.  NULL text is treated as '' (all counts 0,
dominant 'none'): a per-character histogram of nothing is honestly
zero, unlike the n-gram lanes where "nothing to score" stays NULL.

Portability: ONE Python table of codepoint ranges emits BOTH the
Java character classes (Spark, literal BMP chars via ``chr``) and
the RE2 classes (DuckDB, ``\\x{....}`` escapes), and ONE generator
emits the shared CASE/greatest derivation text — neither side is
hand-maintained, so the engines cannot drift.  Counts are
``length(t) - length(regexp_replace(t, class, ''))``; both engines
count codepoints and replace globally, and every range is BMP so
Java's UTF-16 classes and RE2's codepoint classes agree.

Scale shape: a pure per-row map-only projection — one regexp pass
per script class (11 passes), no shuffle, no Python, no UDF; it
composes into the scan ahead of any dedup/quality shuffle.  The
plan audit (tests/test_plans_queued.py) pins shuffle-free and
Python-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# (name, ((lo, hi), ...)) — fixed public Unicode ranges; ORDER is the
# dominant-script tie-break.  Letter scripts first, then digit/space.
SCRIPT_RANGES: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("latin", ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0xD6), (0xD8, 0xF6),
               (0xF8, 0x24F))),
    ("greek", ((0x370, 0x3FF),)),
    ("cyrillic", ((0x400, 0x4FF),)),
    ("hebrew", ((0x590, 0x5FF),)),
    ("arabic", ((0x600, 0x6FF),)),
    ("devanagari", ((0x900, 0x97F),)),
    ("han", ((0x4E00, 0x9FFF),)),
    ("kana", ((0x3040, 0x309F), (0x30A0, 0x30FF))),
    ("hangul", ((0xAC00, 0xD7A3),)),
)
LETTER_SCRIPTS = tuple(name for name, _ in SCRIPT_RANGES)
_EXTRA_CLASSES: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("digit", ((0x30, 0x39),)),
    ("space", ((0x09, 0x0D), (0x20, 0x20))),
)
MIN_LETTERS = 20  # mixed_script floor
MIX_DEN = 10      # mixed when (letters - top) * MIX_DEN >= letters


def _java_class(ranges: tuple[tuple[int, int], ...]) -> str:
    """Literal-char Java regex class (all ranges are BMP)."""
    return "[" + "".join(
        chr(lo) if lo == hi else f"{chr(lo)}-{chr(hi)}" for lo, hi in ranges
    ) + "]"


def _re2_class(ranges: tuple[tuple[int, int], ...]) -> str:
    """RE2 hex-escape class for the DuckDB side."""
    return "[" + "".join(
        f"\\x{{{lo:04X}}}" if lo == hi
        else f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}"
        for lo, hi in ranges
    ) + "]"


def _derived_sql() -> tuple[str, str, str]:
    """(letters_expr, dominant_expr, mixed_expr) — plain SQL text
    valid in BOTH engines over the ``n_<name>`` count columns; the
    single source for the derivation in operator and oracle."""
    letters = " + ".join(f"n_{n}" for n in LETTER_SCRIPTS)
    top = "greatest(" + ", ".join(f"n_{n}" for n in LETTER_SCRIPTS) + ")"
    branches = []
    for i, name in enumerate(LETTER_SCRIPTS):
        later = [f"n_{name} >= n_{m}" for m in LETTER_SCRIPTS[i + 1:]]
        cond = " AND ".join([f"n_{name} > 0", *later]) if later else (
            f"n_{name} > 0"
        )
        branches.append(f"WHEN {cond} THEN '{name}'")
    dominant = "CASE " + " ".join(branches) + " ELSE 'none' END"
    mixed = (
        f"n_letter >= {MIN_LETTERS}"
        f" AND (n_letter - {top}) * {MIX_DEN} >= n_letter"
    )
    return letters, dominant, mixed


def script_mix_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document script composition (module docstring): returns
    ``id_col, n_chars, n_<script>..., n_digit, n_space, n_letter,
    dominant_script, mixed_script`` — all counts BIGINT, exact."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        (F.length(t) - F.length(F.regexp_replace(t, _java_class(r), "")))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, r in (*SCRIPT_RANGES, *_EXTRA_CLASSES)
    ]
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("bigint").alias("n_chars"),
        *counts,
    )
    letters, dominant, mixed = _derived_sql()
    return base.withColumn(
        "n_letter", F.expr(letters).cast("bigint")
    ).select(
        "doc_id",
        "n_chars",
        *[f"n_{name}" for name, _ in (*SCRIPT_RANGES, *_EXTRA_CLASSES)],
        "n_letter",
        F.expr(dominant).alias("dominant_script"),
        F.expr(mixed).alias("mixed_script"),
    )


def script_mix_oracle(
    source_sql: str = "SELECT doc_id, text FROM documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`script_mix_stats` from the SAME range table and the SAME
    derivation text (``source_sql`` yields ``id_col, text_col``)."""
    count_cols = ",\n           ".join(
        f"CAST(length(t) - length(regexp_replace(t,"
        f" '{_re2_class(r)}', '', 'g')) AS BIGINT) AS n_{name}"
        for name, r in (*SCRIPT_RANGES, *_EXTRA_CLASSES)
    )
    letters, dominant, mixed = _derived_sql()
    return f"""WITH src AS (
    SELECT {id_col} AS doc_id, COALESCE({text_col}, '') AS t
    FROM ({source_sql})
), c AS (
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars,
           {count_cols}
    FROM src
), l AS (
    SELECT c.*, CAST({letters} AS BIGINT) AS n_letter FROM c
)
SELECT doc_id, n_chars,
       {", ".join(f"n_{name}" for name, _ in (*SCRIPT_RANGES, *_EXTRA_CLASSES))},
       n_letter,
       {dominant} AS dominant_script,
       {mixed} AS mixed_script
FROM l"""
