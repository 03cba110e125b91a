"""Exact φ-heavy-hitters at scale: distributed Misra-Gries
candidate generation + one exact verify pass.

The classic two-pass trick (Misra & Gries 1982; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012 — public results):

1. each partition runs a Misra-Gries summary with ``m`` counters
   over its rows and emits only its surviving KEYS (≤ m per
   partition).  MG's undercount is bounded by ``n_p/(m+1)``, so any
   key with partition frequency > ``n_p/(m+1)`` survives; by
   averaging, a key with GLOBAL count > ``n/k`` exceeds that bar in
   at least one partition whenever ``m >= k`` — the candidate union
   provably contains every true heavy hitter;
2. one exact count pass restricted to the candidates (broadcast
   semi join — candidates are ≤ m × n_partitions keys, metadata-
   sized) then keep ``count * k > total``.

The output is therefore EXACT — precisely the keys with global
count > n/k, with exact counts — while the full-cardinality shuffle
a plain groupBy-count needs (every distinct key) shrinks to the
candidate set.  At 100 TB vocabulary-scale columns that is the
difference between shuffling billions of distinct keys and
shuffling thousands.  Complements the engine's other mergeable
sketches (HLL distinct / GK quantiles, q:sketch_distinct_quantiles)
with the frequent-items member of the family, and unlike those its
result is exactly SQL-replayable, so the gate is a full value hash,
not an accuracy contract.

The MG state lives inside one ``mapInPandas`` pass (Arrow batches,
per-batch ``value_counts`` pre-aggregation — the dict update is
per-DISTINCT-key-in-batch, not per row); nothing but candidate keys
and the scalar total ever leave the executors.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _mg_partition(key: str, m: int):
    import pandas as pd

    def fn(batches):
        mg: Counter = Counter()
        for pdf in batches:
            vc = pdf[key].dropna().value_counts()
            for kk, v in vc.items():
                mg[kk] += int(v)
            if len(mg) > m:
                # batched MG decrement: subtract the (m+1)-th largest
                # counter from all, drop non-positive — each such event
                # removes >= (m+1)*c total mass, preserving the
                # n_p/(m+1) undercount bound (Mergeable Summaries §3)
                c = sorted(mg.values(), reverse=True)[m]
                mg = Counter({kk: v - c for kk, v in mg.items() if v > c})
        yield pd.DataFrame({key: list(mg.keys())})

    return fn


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int, m: int | None = None
) -> DataFrame:
    """All keys whose global count strictly exceeds ``total/k``,
    with exact counts — two passes, candidate-bounded shuffle.

    ``m`` (candidate counters per partition) defaults to ``k``, the
    smallest capacity with the containment guarantee; raise it to
    shrink the per-partition false-candidate rate (never needed for
    correctness — the verify pass is exact either way)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    m = k if m is None else m
    if m < k:
        raise ValueError(f"m={m} < k={k} breaks the containment guarantee")
    keyed = df.select(F.col(key_col))
    key_dt = keyed.schema[key_col].dataType.simpleString()
    cands = (
        keyed.mapInPandas(_mg_partition(key_col, m), f"{key_col} {key_dt}")
        .distinct()
    )
    total = keyed.where(F.col(key_col).isNotNull()).count()
    counts = (
        keyed.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return counts.where(F.col("n_occurrences") * k > F.lit(total))
