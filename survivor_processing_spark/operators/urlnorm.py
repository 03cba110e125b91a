"""URL canonicalization — the normalization pass crawl-scale dedup
runs BEFORE any content hash: the same page arrives as
``HTTP://Site.com:80/a/?utm_source=x&b=1#frag`` and
``http://site.com/a?b=1``, and exact dedup (q:exact_dedup_docs)
only collapses them after canonicalization.  The reference scrapes
fixed wiki URLs (survivor_processing's fetch notebooks hard-code
them); this is the generalization a 100 TB crawl pipeline needs.

Canonical form (each step cited to the public crawl-dedup
conventions): trim → strip fragment → lowercase scheme and host →
drop default ports (http:80, https:443) → drop tracking params
(``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``) → sort the
remaining query params bytewise → strip trailing slashes from the
path.  Strings without a ``scheme://`` prefix pass through with
only trim + fragment-strip (not URLs we can safely restructure).

Portability: ONE Python generator emits the SAME step pipeline as a
Spark SQL expression and as a DuckDB expression (dialect table for
the few spelled-differently functions: split/element-access,
startswith, array join/sort) — the two engines cannot drift because
neither expression is hand-maintained.  Everything is regexp +
higher-order array functions on ASCII metacharacters; no lookahead,
no collation-sensitive compare (bytewise sort on ASCII param
strings), so Java regex and RE2 agree.

Scale shape: a pure per-row codegen'd projection — no shuffle, no
Python, no UDF; it composes into scans ahead of any dedup shuffle
and costs one pass over the column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "ref")

_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def _canon_expr(u: str, dialect: str) -> str:
    """The canonicalization pipeline over expression ``u``, emitted
    for ``dialect`` in {'spark', 'duckdb'}.  Both strings come from
    these templates — change semantics HERE only."""
    if dialect == "spark":
        def split0(s, sep):  # first piece of a literal split
            return f"split({s}, '{sep}')[0]"

        def starts(s, pfx):
            return f"startswith({s}, '{pfx}')"

        def lfilter(arr, lam):
            return f"filter({arr}, {lam})"

        def lsort(arr):
            return f"array_sort({arr})"

        def ljoin(arr, sep):
            return f"array_join({arr}, '{sep}')"

        split = "split"
    elif dialect == "duckdb":
        def split0(s, sep):
            return f"string_split({s}, '{sep}')[1]"

        def starts(s, pfx):
            return f"starts_with({s}, '{pfx}')"

        def lfilter(arr, lam):
            return f"list_filter({arr}, {lam})"

        def lsort(arr):
            return f"list_sort({arr})"

        def ljoin(arr, sep):
            return f"array_to_string({arr}, '{sep}')"

        split = "string_split"
    else:
        raise ValueError(f"unknown dialect: {dialect}")

    t = f"regexp_replace(trim({u}), '#.*$', '')"
    scheme = f"lower(regexp_extract({t}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({t}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    host = f"lower(regexp_replace({hostport}, ':[0-9]+$', ''))"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    pathquery = f"regexp_replace({rest}, '^[^/?]*', '')"
    path = f"regexp_replace(regexp_extract({pathquery}, '^([^?]*)', 1), '/+$', '')"
    # [?] not \? — Spark SQL string literals consume one backslash
    # layer (escapedStringLiterals=false) while DuckDB strings do
    # not, so a class-escape is the only spelling both parse alike
    rawq = f"regexp_extract({pathquery}, '[?](.*)$', 1)"
    name = split0("x", "=")
    drop = (
        f"x = '' OR {starts(name, 'utm_')} OR "
        + " OR ".join(f"{name} = '{p}'" for p in TRACKING_EXACT)
    )
    q = ljoin(lsort(lfilter(f"{split}({rawq}, '&')", f"x -> NOT ({drop})")), "&")
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80')"
        f" OR ({scheme} = 'https' AND {port} = '443')))"
    )
    rebuilt = (
        f"concat({scheme}, '://', {host},"
        f" CASE WHEN {keep_port} THEN concat(':', {port}) ELSE '' END,"
        f" {path},"
        f" CASE WHEN {q} <> '' THEN concat('?', {q}) ELSE '' END)"
    )
    # explicit NULL head: Spark's concat propagates NULL but DuckDB's
    # skips it (would rebuild a NULL url as '://')
    return (
        f"CASE WHEN {u} IS NULL THEN NULL"
        f" WHEN {scheme} = '' THEN {t} ELSE {rebuilt} END"
    )


def canonicalize_url_expr(url_col: str) -> Column:
    """Composable Spark Column canonicalizing ``url_col``."""
    return F.expr(_canon_expr(url_col, "spark"))


def url_canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``url_canon`` next to ``url_col`` — NULL urls stay NULL
    (regexp functions propagate NULL in both engines)."""
    return df.withColumn("url_canon", canonicalize_url_expr(url_col))


def url_canonicalize_oracle(source_sql: str, url_col: str = "url") -> str:
    """DuckDB SQL replaying :func:`url_canonicalize` over
    ``source_sql`` — generated from the same step templates."""
    return (
        f"SELECT *, {_canon_expr(url_col, 'duckdb')} AS url_canon"
        f" FROM ({source_sql})"
    )
