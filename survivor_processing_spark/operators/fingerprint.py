"""Order-insensitive table content fingerprint — the cheap
full-table equality check an incremental pipeline runs after every
replay: B1's MERGE and N3's idempotent re-run promise "same rows";
this operator makes the promise testable at 100 TB without sorting
anything (collecting or ordering a table to compare it is exactly
what a large table forbids).  Complements q:merge_upsert_idempotent
/ q:entity_quarantine_roundtrip, which prove idempotence at gate
scale — the fingerprint is how production validates it per run.

Mechanics: each row serializes to ``concat_ws(chr(31), coalesce(col,
null-marker)...)`` (unit-separator field delimiter; explicit marker
because BOTH engines' concat_ws would silently SKIP a bare NULL —
(NULL,'x') and ('x',NULL) must fingerprint differently), hashes to
the md5-prefix 60-bit integer lane (the engine-portable hash the
simhash/split families already gate), and the table fingerprint is
the SUM of lanes in exact wide arithmetic (Spark decimal(38,0),
DuckDB HUGEINT) reduced mod 2^61−1.  Addition is commutative, so
the fingerprint is independent of row order AND partitioning —
a multiset invariant, which is the right equality for tables.

Float columns are REJECTED at call time: their string forms are not
engine-portable (callers quantize or format upstream — the same
rule every portable gate in this repo follows).

Scale shape: one codegen'd projection + a single partial-aggregable
SUM — no shuffle beyond the final 1-row reduce, no Python, no
ordering anywhere.  Collision posture: 60-bit lanes summed mod a
Mersenne prime — adversarial collisions are constructible (this is
an integrity check, not an authentication tag); for hostile inputs
swap the lane for a keyed hash upstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MERSENNE_61 = (1 << 61) - 1
NULL_MARKER = "__sps_null__"


def _lane(serialized: str) -> str:
    """md5-prefix 60-bit lane of an expression, Spark dialect."""
    return f"cast(conv(substring(md5({serialized}), 1, 15), 16, 10) as bigint)"


def content_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ONE-row DataFrame ``n_rows bigint, fp bigint`` fingerprinting
    the multiset of ``cols`` tuples (default: all columns, schema
    order).  Equal multisets ⇒ equal fingerprints, any order, any
    partitioning."""
    cols = list(cols) if cols is not None else [f.name for f in df.schema]
    bad = [
        f.name
        for f in df.schema
        if f.name in cols and f.dataType.simpleString() in ("float", "double")
    ]
    if bad:
        raise ValueError(
            f"float columns are not portably stringifiable: {bad} — "
            "quantize to integer lanes or format to string upstream"
        )
    parts = ", ".join(
        f"coalesce(cast({c} as string), '{NULL_MARKER}')" for c in cols
    )
    ser = f"concat_ws(chr(31), {parts})"
    return df.select(F.expr(_lane(ser)).alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "cast(coalesce(sum(cast(_h as decimal(38,0))),"
            f" cast(0 as decimal(38,0))) % {MERSENNE_61} as bigint)"
        ).alias("fp"),
    )


def content_fingerprint_oracle(
    cols: list[str], source_sql: str
) -> str:
    """DuckDB SQL replaying :func:`content_fingerprint` over
    ``source_sql`` — same serialization, lane, and modulus."""
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{NULL_MARKER}')" for c in cols
    )
    ser = f"concat_ws(chr(31), {parts})"
    lane = f"CAST(('0x' || substr(md5({ser}), 1, 15)) AS BIGINT)"
    return f"""WITH src AS ({source_sql}), lanes AS (
    SELECT {lane} AS h FROM src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(h), 0) % {MERSENNE_61} AS BIGINT) AS fp
FROM lanes"""
