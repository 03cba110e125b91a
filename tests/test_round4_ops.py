"""Round-4 additions: Bloom pre-filter join, interval islands merge,
and overlapping document chunking."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from survivor_processing_spark.operators.bloom import (
    bloom_filter_literal,
    bloom_semi_join,
    might_contain,
)
from survivor_processing_spark.operators.timeseries import merge_intervals
from survivor_processing_spark.queries import REGISTRY
from survivor_processing_spark.queries.corpus import chunk_documents


# --- bloom ------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every inserted key must pass might_contain — the Bloom contract."""
    keys = spark.range(0, 2000).select((F.col("id") * 7919 + 13).alias("k"))
    blit = bloom_filter_literal(keys, "k", num_bits=1 << 14, num_hashes=5)
    hits = keys.filter(might_contain(blit, F.col("k"), 1 << 14, 5)).count()
    assert hits == 2000


def test_bloom_false_positive_rate_reasonable(spark):
    """Non-member pass rate stays near theoretical fpp (~3% at
     8 bits/key, k=5); a broken hash family degenerates to ~100%."""
    member = spark.range(0, 2000).select(F.col("id").alias("k"))
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    blit = bloom_filter_literal(member, "k", num_bits=1 << 14, num_hashes=5)
    fp = probe.filter(might_contain(blit, F.col("k"), 1 << 14, 5)).count()
    assert fp / 10_000 < 0.15


def test_bloom_semi_join_exact_vs_plain_semi(spark):
    """The Bloom cut plus verify join returns EXACTLY the plain semi
    join's rows (false positives repaired, no false negatives)."""
    rng = random.Random(42)
    fact_keys = [rng.randrange(0, 500) for _ in range(3000)]
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k int, payload int"
    )
    dim = spark.createDataFrame(
        [(k,) for k in range(0, 500, 7)], "dk int"
    )
    got = sorted(
        (r.k, r.payload)
        for r in bloom_semi_join(fact, dim, "k", "dk", 1 << 12, 4).collect()
    )
    want = sorted(
        (k, i) for i, k in enumerate(fact_keys) if k % 7 == 0
    )
    assert got == want


def test_bloom_query_plan_no_shuffle_join(spark, sf_dir):
    """Plan audit: the membership predicate is a literal inside the
    fact scan stage (no join for it at all), the exact semi join is
    broadcast — no SortMergeJoin anywhere."""
    df = REGISTRY["bloom_prefilter_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- interval merge ---------------------------------------------------------


def _brute_merge(intervals):
    """Reference island merge: sort, sweep, merge overlap/touch."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return sorted((s, e, n) for s, e, n in out)


def test_merge_intervals_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = []
    for key in ["a", "b", "c"]:
        for _ in range(200):
            s = rng.randrange(0, 2000)
            rows.append((key, s, s + rng.randrange(1, 60)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = merge_intervals(df, ["k"], "s", "e").collect()
    for key in ["a", "b", "c"]:
        want = _brute_merge([(s, e) for k, s, e in rows if k == key])
        have = sorted(
            (r.island_start, r.island_end, r.n_intervals)
            for r in got
            if r.k == key
        )
        assert have == want, key


def test_merge_intervals_duplicate_and_touching(spark):
    """Duplicate intervals join the same island; end == next start
    merges (closed-interval touch); a gap of 1 splits."""
    rows = [("u", 0, 10), ("u", 0, 10), ("u", 10, 20), ("u", 22, 30)]
    df = spark.createDataFrame(rows, "u string, s long, e long")
    got = sorted(
        (r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(df, ["u"], "s", "e").collect()
    )
    assert got == [(0, 20, 3), (22, 30, 1)]


def test_interval_islands_single_shuffle_plan(spark, sf_dir):
    """Both windows and the final agg reuse one hash partitioning on
    user_id: exactly one exchange after the scan."""
    df = REGISTRY["interval_merge_islands"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- doc chunking -----------------------------------------------------------


def test_doc_chunks_reconstruct_documents(spark, sf_dir):
    """Dropping each chunk's 50-char overlap tail and concatenating in
    chunk order reproduces every document exactly."""
    out = REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in out.collect():
        chunks.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    assert set(chunks) == set(docs)
    for doc_id, parts in chunks.items():
        parts.sort()
        rebuilt = "".join(
            (t[:150] if i < len(parts) - 1 else t)
            for i, (_, t) in enumerate(parts)
        )
        assert rebuilt == docs[doc_id], doc_id
        # chunk ordinals are dense from 0
        assert [c for c, _ in parts] == list(range(len(parts)))


def test_doc_chunks_empty_text_yields_one_chunk(spark):
    """Empty and NULL text each yield exactly one empty chunk through
    the PRODUCTION chunking expression (the same helper the registered
    doc_chunk_overlap query runs), not a re-implementation."""
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id int, text string"
    )
    rows = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.chunk_len)
        for r in chunk_documents(df).collect()
    )
    assert rows == [(1, 0, "", 0), (2, 0, "", 0)]


def test_doc_chunk_plan_is_map_only(spark, sf_dir):
    """Chunking must stay inside the scan stage: no exchange at all."""
    df = REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- RANGE-frame sliding window ---------------------------------------------


def test_sliding_range_window_matches_bruteforce(spark):
    """Trailing-3600s frame per user vs a brute-force python sweep,
    including duplicate-timestamp peers (RANGE includes all peers)."""
    rows = [
        ("u", 0, 10.0), ("u", 1800, 20.0), ("u", 3600, 30.0),
        ("u", 3600, 40.0), ("u", 7300, 50.0), ("v", 100, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_epoch long, value double")
    import pyspark.sql.functions as FF
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id").orderBy("ts_epoch").rangeBetween(-3600, W.currentRow)
    )
    got = {
        (r.user_id, r.ts_epoch, r.value): (r.n, r.s)
        for r in df.select(
            "user_id", "ts_epoch", "value",
            FF.count(FF.lit(1)).over(w).alias("n"),
            FF.sum("value").over(w).alias("s"),
        ).collect()
    }
    for u, t, v in rows:
        peer = [(uu, tt, vv) for uu, tt, vv in rows if uu == u and t - 3600 <= tt <= t]
        assert got[(u, t, v)] == (len(peer), sum(p[2] for p in peer)), (u, t)


def test_sliding_range_window_single_shuffle_plan(spark, sf_dir):
    df = REGISTRY["sliding_range_window"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
