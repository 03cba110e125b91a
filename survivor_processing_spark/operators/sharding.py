"""Rendezvous (highest-random-weight) shard routing — stable key →
shard assignment with the minimal-disruption guarantee: when a shard
is ADDED, every key either keeps its shard or moves to the NEW one
(expected 1/(n+1) of keys); when one is REMOVED, only ITS keys move.
Hash-mod routing (``pmod(hash(key), n)``) reshuffles ~all keys on
any topology change — at 100 TB that is a full-corpus rewrite, which
is why the public HRW construction (Thaler & Ravishankar 1998, the
scheme behind consistent object routing) exists.  Complements the
static exports (q:export_balanced_shards, compaction planner): those
LAY OUT a fixed snapshot; this ROUTES an evolving keyspace.

Construction: shard(key) = argmax over shards s of
``md5(key || ':' || s)`` — the engine-portable hash every gate in
this repo shares; ties (2⁻¹²⁸) break by shard name.  The argmax is
ONE descending sort of an n-element struct array per row — a pure
JVM projection, no shuffle, no Python; both engines compare
``struct(h, s)`` lexicographically, and the DuckDB expression is
emitted from the same shard list so the oracle cannot drift.

Scale shape: zero shuffles for assignment (composes into scans
ahead of a partitioned write); the summary is one grouped count.
Shard count n multiplies per-row hashing cost — fine for the
10-1000-shard routing tables this exists for (for 10⁶+ virtual
nodes use a two-level scheme: rendezvous over shard GROUPS, then
within the group).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _assign_expr_spark(id_col: str, shards: list[str]) -> str:
    parts = ", ".join(
        f"named_struct('h', md5(concat(cast({id_col} as string), ':', '{s}')),"
        f" 's', '{s}')"
        for s in shards
    )
    return f"sort_array(array({parts}), false)[0].s"


def _assign_expr_duckdb(id_col: str, shards: list[str]) -> str:
    parts = ", ".join(
        f"{{'h': md5(CAST({id_col} AS VARCHAR) || ':' || '{s}'),"
        f" 's': '{s}'}}"
        for s in shards
    )
    return f"(list_reverse_sort([{parts}]))[1].s"


def _check_shards(shards: list[str]) -> None:
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError(f"duplicate shard names: {shards}")
    bad = [s for s in shards if "'" in s or ":" in s]
    if bad:
        raise ValueError(f"shard names may not contain ' or ': {bad}")


def rendezvous_assign_expr(id_col: str, shards: list[str]) -> Column:
    """Composable Column: the HRW shard for ``id_col``."""
    _check_shards(shards)
    return F.expr(_assign_expr_spark(id_col, shards))


def rendezvous_assign(
    df: DataFrame, id_col: str, shards: list[str]
) -> DataFrame:
    """Adds ``shard`` — the HRW assignment of ``id_col``."""
    expr = rendezvous_assign_expr(id_col, shards)  # validate first
    return df.withColumn("shard", expr)


def rendezvous_summary(
    df: DataFrame, id_col: str, shards: list[str]
) -> DataFrame:
    """Per-shard rollup ``shard, n_keys`` (the gate-friendly shape;
    balance follows from the hash, disruption from the invariant the
    tests assert)."""
    _check_shards(shards)  # before any attribute access on df
    return (
        rendezvous_assign(df, id_col, shards)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def rendezvous_oracle(
    source_sql: str, id_col: str, shards: list[str]
) -> str:
    """DuckDB SQL replaying :func:`rendezvous_summary` over
    ``source_sql`` — emitted from the same shard list."""
    _check_shards(shards)
    return f"""WITH src AS ({source_sql})
SELECT {_assign_expr_duckdb(id_col, shards)} AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM src
GROUP BY 1"""
