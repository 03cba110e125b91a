"""Distributed Bloom-filter build and map-side join pre-filter.

The 100 TB join pattern this encodes: when a selective dimension
predicate keeps only a sliver of the dim, the fact side should be
cut BEFORE its shuffle, not after.  A Bloom filter over the
surviving dim keys is built distributed (explode k seed-hashes →
bit positions → one word-level ``bit_or`` aggregation), folded into
a SINGLE row holding a ``map<int, bigint>`` of non-zero 64-bit
words, and broadcast to the fact side, where membership is a pure
JVM expression (xxhash64 + shift/mask + map lookup) inside
whole-stage codegen — no Python, no driver ``collect()``, no
shuffle of fact rows that cannot join.

Bloom filters admit false positives, never false negatives, so the
pre-filter is always followed by the exact (now much smaller) semi
join; results are exactly the un-filtered join's.  Catalyst grows
the same idea as a runtime InSubquery/bloom rewrite
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only for
shuffle-join shapes it recognizes; this operator makes the pattern
explicit and composable.

Sizing: ``num_bits`` is a build-time constant (default 2**20 bits =
128 KiB broadcast) — at 10 bits/key that holds ~100k keys at ~1%
false-positive rate; beyond that the filter stays CORRECT but
degrades toward pass-through, and the exact semi join still repairs
the result.  The single-row fold is a two-level aggregation
(partial ``bit_or`` map-side), so no executor ever materializes
more than its own partial word map.

Reference anchor: the reference pre-loads full lookup tables into
pandas before filtering (helpers/db_funcs.py:4-45); this is the
scale-safe inversion of that pattern.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions for ``key`` (enhanced-double-hash
    family over two xxhash64 lanes — standard Kirsch-Mitzenmacher)."""
    # Each lane is reduced mod num_bits BEFORE the double-hash combine
    # so the arithmetic stays far from long range (ANSI mode overflows
    # raw xxhash64 sums); the combine then needs at most
    # num_hashes * num_bits headroom.
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(num_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(num_hashes)
    ]


def _powers() -> Column:
    """64-entry literal long array: element i+1 is the word with only
    bit i set (bit 63 is long-min in two's complement).
    ``shiftleft``'s shift amount must be a Python int in PySpark, so
    dynamic single-bit masks come from this literal lookup instead.
    Built lazily — Column literals need an active SparkContext."""
    return F.array(
        *[F.lit(1 << i).cast("long") for i in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Fold ``keys[key_col]`` into a 1-row DataFrame with column
    ``bloom: map<int, bigint>`` of the filter's non-zero words.

    Distributed end-to-end: explode to (word, bit) pairs, partial
    ``bit_or`` per word map-side, final fold to one map row.  The
    row is broadcast-sized by construction (≤ num_bits/64 entries).
    """
    pos = keys.select(
        F.explode(
            F.array(*_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / F.lit(64)).cast("int").alias("w"),
        F.element_at(
            _powers(), F.col("p").bitwiseAND(F.lit(63)).cast("int") + F.lit(1)
        ).alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("word"))
    return words.select(F.struct("w", "word").alias("e")).agg(
        F.map_from_entries(F.collect_list("e")).alias("bloom")
    )


def might_contain(
    bloom: Column, key: Column, num_bits: int = 1 << 20, num_hashes: int = 5
) -> Column:
    """JVM-side membership test against a ``build_bloom`` map column.

    True for every key that was inserted (no false negatives);
    spuriously true at the filter's false-positive rate.
    """
    checks = []
    for p in _positions(key, num_bits, num_hashes):
        w = (p / F.lit(64)).cast("int")
        bit = F.element_at(
            _powers(), p.bitwiseAND(F.lit(63)).cast("int") + F.lit(1)
        )
        checks.append(
            F.coalesce(F.element_at(bloom, w), F.lit(0).cast("long"))
            .bitwiseAND(bit)
            != 0
        )
    return reduce(lambda a, b: a & b, checks)


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi join of ``fact`` against ``dim_keys``, Bloom-cut.

    Plan shape: fact → broadcast-nested-loop against the 1-row bloom
    (map-only, no fact shuffle) → membership filter → broadcast LEFT
    SEMI hash join for exactness.  Equivalent to
    ``fact WHERE fact_key IN (SELECT dim_key FROM dim_keys)``.
    """
    bloom = build_bloom(dim_keys, dim_key, num_bits, num_hashes)
    pre = (
        fact.join(F.broadcast(bloom))
        .filter(might_contain(F.col("bloom"), F.col(fact_key), num_bits, num_hashes))
        .drop("bloom")
    )
    dim = dim_keys.select(F.col(dim_key).alias("__bloom_dk")).distinct()
    return pre.join(
        F.broadcast(dim),
        on=pre[fact_key] == dim["__bloom_dk"],
        how="left_semi",
    )
