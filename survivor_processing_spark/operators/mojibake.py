"""Encoding-damage (mojibake) detection — the curation pass that
catches text mangled BEFORE it reached the pipeline (queued r13).

A web-scale corpus carries three classic encoding-damage artifacts no
language or quality model flags reliably: (1) U+FFFD replacement
characters (a decoder already gave up), (2) stray C1 control
codepoints U+0080–U+009F (cp1252 bytes decoded as latin-1), and
(3) UTF-8 byte sequences decoded as cp1252/latin-1 — the "Ã©"-class
digraphs, where the two UTF-8 bytes of an accented letter surface as
two spurious Latin-1 characters ("Ã©" for é, "â€" leading the
curly-quote family).  Stripping or down-weighting such documents is a
standard curation step (the quality-filter stacks run it before
dedup so damaged twins of clean pages don't poison near-dup
clusters); the reference scrapes curated wiki pages and has no
analog.

Semantics: per document, exact counts of each artifact class plus a
per-10k-chars damage lane and a suspect flag — every output integer
or boolean, engine-portable:

    damage      = n_replacement + n_c1_controls + n_utf8_digraphs
    damage_lane = damage * 10000 DIV n_chars   (0 for empty text)
    suspect     = n_replacement > 0 OR damage_lane >= lane_threshold

The digraph list is a fixed table of TWO-character patterns; with
equal-length alternatives, Java's leftmost-first and RE2's
leftmost-longest alternation agree, so the non-overlapping match
counts are identical.  NULL text is '' (all zeros, not suspect) —
same contract as :mod:`.scripts`.

Portability: one Python table emits the Spark pattern AND the DuckDB
pattern (identical literals — no metacharacters in the digraphs);
class counts are ``length(t) - length(regexp_replace(t, class,
''))``; digraph counts are ``size/len(regexp_extract_all(...))``,
the same non-overlapping scan in both engines.

Scale shape: pure map-only projection (3 regexp passes), no shuffle,
no Python; composes into the scan ahead of dedup so damaged docs are
flagged before they cost a shuffle.  Plan audit pins
no-Exchange/no-Python (tests/test_plans_queued.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Two-character UTF-8-as-cp1252/latin-1 artifacts.  Each entry is the
# visible mis-decoding of a common UTF-8 sequence; all are exactly 2
# chars so the engines' alternation semantics agree (module
# docstring).  'â€' covers the curly-quote/dash family (â€™ â€œ â€“
# ...) by its shared 2-char prefix.
UTF8_DIGRAPHS: tuple[str, ...] = (
    "Ã©",  # Ã© = é
    "Ã¨",  # Ã¨ = è
    "Ã¡",  # Ã¡ = á
    "Ã ",  # Ã  = à
    "Ã¤",  # Ã¤ = ä
    "Ã¶",  # Ã¶ = ö
    "Ã¼",  # Ã¼ = ü
    "Ã±",  # Ã± = ñ
    "Ã§",  # Ã§ = ç
    "Ã£",  # Ã£ = ã
    "Ã³",  # Ã³ = ó
    "Ãº",  # Ãº = ú
    "Ã­",  # Ã­ = í
    "Ãª",  # Ãª = ê
    "Â ",  # Â  = NBSP
    "Â°",  # Â° = °
    "Â·",  # Â· = ·
    "Â»",  # Â» = »
    "Â«",  # Â« = «
    "â€",  # â€ = prefix of ’ “ ” – — …
)
LANE_DEN = 10_000     # damage lane is per-10k characters
LANE_THRESHOLD = 50   # suspect at >= 0.5% damaged characters

# built from codepoints, not pasted literals — C1 controls are
# invisible in source and editors would mangle them
_REPL_CLASS = "[" + chr(0xFFFD) + "]"
_C1_CLASS = "[" + chr(0x80) + "-" + chr(0x9F) + "]"
_RE2_REPL = "[\\x{FFFD}]"
_RE2_C1 = "[\\x{0080}-\\x{009F}]"


def _digraph_pattern() -> str:
    return "|".join(UTF8_DIGRAPHS)


def mojibake_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document encoding-damage stats (module docstring): returns
    ``id_col, n_chars, n_replacement, n_c1_controls, n_utf8_digraphs,
    damage_lane, suspect`` — counts BIGINT, exact."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def class_count(cls: str):
        return (F.length(t) - F.length(F.regexp_replace(t, cls, ""))).cast(
            "bigint"
        )

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("bigint").alias("n_chars"),
        class_count(_REPL_CLASS).alias("n_replacement"),
        class_count(_C1_CLASS).alias("n_c1_controls"),
        F.size(F.regexp_extract_all(t, F.lit(_digraph_pattern()), 0))
        .cast("bigint")
        .alias("n_utf8_digraphs"),
    )
    # two-step projection (the scripts.py n_letter pattern): the lane
    # formula exists ONCE on the Spark side, and suspect derives from
    # the projected column — no duplicated expression to drift
    return base.withColumn(
        "damage_lane",
        F.expr(
            "if(n_chars = 0, cast(0 as bigint),"
            " ((n_replacement + n_c1_controls + n_utf8_digraphs)"
            f" * {LANE_DEN}) DIV n_chars)"
        ),
    ).select(
        "doc_id",
        "n_chars",
        "n_replacement",
        "n_c1_controls",
        "n_utf8_digraphs",
        "damage_lane",
        F.expr(
            f"n_replacement > 0 OR damage_lane >= {LANE_THRESHOLD}"
        ).alias("suspect"),
    )


def mojibake_oracle(
    source_sql: str = "SELECT doc_id, text FROM documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mechanically generate the DuckDB replay of
    :func:`mojibake_stats` from the SAME digraph table and
    thresholds."""
    pat = _digraph_pattern()
    lane = (
        "CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT) ELSE"
        " ((n_replacement + n_c1_controls + n_utf8_digraphs)"
        f" * {LANE_DEN}) // n_chars END"
    )
    return f"""WITH src AS (
    SELECT {id_col} AS doc_id, COALESCE({text_col}, '') AS t
    FROM ({source_sql})
), c AS (
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars,
           CAST(length(t) - length(regexp_replace(t, '{_RE2_REPL}', '', 'g'))
               AS BIGINT) AS n_replacement,
           CAST(length(t) - length(regexp_replace(t, '{_RE2_C1}', '', 'g'))
               AS BIGINT) AS n_c1_controls,
           CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT)
               AS n_utf8_digraphs
    FROM src
)
SELECT doc_id, n_chars, n_replacement, n_c1_controls, n_utf8_digraphs,
       {lane} AS damage_lane,
       n_replacement > 0 OR {lane} >= {LANE_THRESHOLD} AS suspect
FROM c"""
