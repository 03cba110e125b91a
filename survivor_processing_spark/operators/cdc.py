"""Changelog (CDC) application — the generalized form of the
reference's keyed upserts.

The reference replays extracts into Postgres with ON CONFLICT
upserts (reference: helpers/load_helpers.py:4-39) — an insert/update
changelog with no deletes and no ordering.  Real ingestion feeds are
ordered I/U/D changelogs (Debezium-style); ``apply_changelog``
collapses one to its end state and merges it over a base snapshot.

Scale shape: the collapse is ``max_by`` aggregation (map-side
partial, per-key state is ONE row regardless of how many changes a
hot key received — a window ``row_number`` would sort every change
of the hottest key in one task).  The merge is a single full-outer
shuffle join on the key; both sides arrive hash-partitioned by key,
and at 100 TB the base side would be a bucketed table so only the
(much smaller) changelog shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def latest_changes(
    changes: DataFrame, keys: list[str], seq_col: str, op_col: str
) -> DataFrame:
    """Collapse a changelog to the winning change per key: the row
    with the highest ``seq_col`` (caller guarantees uniqueness per
    key — e.g. a log offset).  One hash aggregate, no window."""
    payload = [c for c in changes.columns if c not in keys]
    winner = F.max_by(F.struct(*payload), F.col(seq_col)).alias("_w")
    collapsed = changes.groupBy(*keys).agg(winner)
    return collapsed.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """End state of ``base`` after applying an I/U/D changelog.

    * key only in base → base row survives;
    * key in changelog with final op = delete → row dropped;
    * otherwise → the changelog's latest payload wins (insert or
      update — MERGE semantics, reference load_helpers.py:4-39).
    """
    value_cols = [c for c in base.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col, op_col)
    # Disambiguate overlapping value columns through aliased sides.
    b = base.select(
        *keys, *[F.col(c).alias(f"_b_{c}") for c in value_cols]
    )
    c = latest.select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(v).alias(f"_c_{v}") for v in value_cols],
    )
    merged = b.join(c, keys, "full_outer").filter(
        F.col("_op").isNull() | (F.col("_op") != delete_op)
    )
    picked = [
        F.when(F.col("_op").isNotNull(), F.col(f"_c_{v}"))
        .otherwise(F.col(f"_b_{v}"))
        .alias(v)
        for v in value_cols
    ]
    return merged.select(*keys, *picked)
