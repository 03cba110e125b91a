"""Round-7 additions: the three ADVICE r06 fixes (ragged-vector
Lloyd with dim=None, deferred bloom-view eviction) plus the new
checkable gates — IVF recall floor, float-Lloyd agreement, planted
recall for the xxhash64 simhash/LSH scale variants."""

from __future__ import annotations

import pyspark.sql.functions as F

from survivor_processing_spark.operators.cluster import kmeans_lloyd_portable

# --- ADVICE r06 #1: kmeans_lloyd_portable, dim=None, ragged input -----------


def test_lloyd_portable_ragged_dim_none(spark):
    # before the fix: zip_with NULL-pads the short vector, every
    # distance goes NULL, the label goes NULL, and int(None) raises
    # TypeError driver-side (or a LONG vector's pos overruns the
    # [0]*n_lanes sums list).  After: dim derives from the
    # md5-smallest clean vector and other lengths are quarantined.
    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, [1.1, 2.1, 3.1]),
        (2, [9.0, 9.0]),  # short — must be quarantined, not crash
        (3, [9.0, 9.0, 9.0, 9.0]),  # long — ditto
        (4, [8.0, 8.0, 8.0]),
        (5, None),  # NULL vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_lloyd_portable(df, "embedding", "vec_id", k=2, iters=2)
    labels = {r["vec_id"]: r["cluster_idx"] for r in out.collect()}
    # only the vectors matching the derived dim (3) are labeled
    assert set(labels) == {0, 1, 4}
    assert all(v is not None for v in labels.values())
    # and the derived-dim run equals the explicit-dim run
    explicit = {
        r["vec_id"]: r["cluster_idx"]
        for r in kmeans_lloyd_portable(
            df, "embedding", "vec_id", k=2, iters=2, dim=3
        ).collect()
    }
    assert labels == explicit


def test_lloyd_portable_all_ragged_empty(spark):
    # every vector quarantined after the derived-dim filter leaves
    # only the probe vector's cohort; an all-NULL input is empty out
    df = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    out = kmeans_lloyd_portable(df, "embedding", "vec_id", k=2, iters=1)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cluster_idx"]


# --- ADVICE r06 #2: cache_bounded defers the view drop one generation -------


def test_cache_bounded_view_drop_deferred(spark):
    from survivor_processing_spark.operators import dedup as D

    key = "_test_deferred_drop"
    try:
        a = spark.range(1).select(F.lit(1).alias("v"))
        a.createOrReplaceTempView("_tdd_a")
        D.cache_bounded(key, a, view="_tdd_a")
        b = spark.range(1).select(F.lit(2).alias("v"))
        b.createOrReplaceTempView("_tdd_b")
        D.cache_bounded(key, b, view="_tdd_b")
        # build N's view survives build N+1: an expression written
        # against _tdd_a still analyzes (the ADVICE failure mode was
        # a hard TABLE_OR_VIEW_NOT_FOUND right here)
        assert spark.sql("SELECT v FROM _tdd_a").collect()[0]["v"] == 1
        c = spark.range(1).select(F.lit(3).alias("v"))
        c.createOrReplaceTempView("_tdd_c")
        D.cache_bounded(key, c, view="_tdd_c")
        # ...and is dropped at build N+2 (no catalog accumulation)
        assert not any(
            t.name == "_tdd_a" for t in spark.catalog.listTables()
        )
        assert any(t.name == "_tdd_b" for t in spark.catalog.listTables())
    finally:
        with D._BOUNDED_LOCK:
            D._BOUNDED_CACHE.pop(key, None)
            D._BOUNDED_DROP_QUEUE.pop(key, None)
        for v in ("_tdd_a", "_tdd_b", "_tdd_c"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass


def test_bloom_two_outstanding_builds_analyze(spark):
    # the concrete caller shape ADVICE described: build two
    # bloom-filtered queries, then execute the FIRST — with the
    # deferred drop both analyze and run
    from survivor_processing_spark.operators.bloom import (
        bloom_filter_subquery,
        might_contain,
    )

    keys1 = spark.range(10).select(F.col("id").cast("string").alias("k"))
    keys2 = spark.range(5).select(F.col("id").cast("string").alias("k"))
    probe = spark.range(20).select(F.col("id").cast("string").alias("k"))
    b1 = bloom_filter_subquery(keys1, "k", num_bits=1 << 10)
    q1 = probe.where(might_contain(b1, F.col("k"), num_bits=1 << 10))
    b2 = bloom_filter_subquery(keys2, "k", num_bits=1 << 10)
    q2 = probe.where(might_contain(b2, F.col("k"), num_bits=1 << 10))
    n1, n2 = q1.count(), q2.count()
    assert n1 >= 10 and n2 >= 5  # no false negatives, both executed


# --- the r7 gate conversions (VERDICT r06 #1/#2) ----------------------------


def _one_row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_ivf_recall_bound_gate(spark, sf_dir):
    from survivor_processing_spark.queries import REGISTRY

    r = _one_row(REGISTRY["ivf_recall_bound"].fn(spark, sf_dir))
    assert r["k"] == 10 and r["recall_above_floor"] is True


def test_kmeans_clusters_gate(spark, sf_dir):
    from survivor_processing_spark.queries import REGISTRY

    r = _one_row(REGISTRY["kmeans_clusters"].fn(spark, sf_dir))
    assert r["n_points"] > 0
    assert r["all_labeled"] is True
    assert r["inertia_within_5pct"] is True


def test_simhash_planted_recall_gate(spark, sf_dir):
    from survivor_processing_spark.queries import REGISTRY

    r = _one_row(REGISTRY["simhash_near_pairs"].fn(spark, sf_dir))
    assert r["n_planted"] == 50
    assert r["exact_recall_total"] is True
    assert r["edited_recall_above_half"] is True


def test_embedding_lsh_planted_recall_gate(spark, sf_dir):
    from survivor_processing_spark.queries import REGISTRY

    r = _one_row(REGISTRY["embedding_lsh_pairs"].fn(spark, sf_dir))
    assert r["n_planted"] == 50
    assert r["exact_recall_total"] is True
    assert r["perturbed_recall_above_80pct"] is True
