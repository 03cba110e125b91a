"""Wall-clock the QUEUED (unit-gated, unregistered) operators at
bench scales — the registered registry has SWEEP_SF1.json and
bench.py; this closes the scale-evidence gap for operators waiting
on a rotation slot, so their first registration lands with measured
(not asserted) scaling behavior.

Usage: python tools/bench_queued.py [sf_dir ...]
Prints one JSON line: {"sf_dirs": {dir: {op: sec}}, "round": N}.
Single rep, cold plan per operator (coverage numbers, not best-of-N;
compare within a run, not across hosts).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from survivor_processing_spark import get_spark  # noqa: E402


def _execute(df) -> int:
    return df._jdf.queryExecution().toRdd().count()


def _boilerplate_strip(docs):
    import pyspark.sql.functions as F

    from survivor_processing_spark.operators.dedup import (
        strip_boilerplate_paragraphs,
    )

    d = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias(
            "text"
        ),
    )
    return strip_boilerplate_paragraphs(d, "text", "doc_id", delim="\n")


def _dsir_weights(raw, target):
    from survivor_processing_spark.operators.dsir import (
        dsir_importance_weights,
    )

    return dsir_importance_weights(
        raw.select("doc_id", "text"), target.select("doc_id", "text")
    )


def _mor_upsert_gate(spark, sf_dir):
    from survivor_processing_spark.queries.etl import (
        snapshot_mor_upsert_gate,
    )

    return snapshot_mor_upsert_gate(spark, sf_dir)


def _time_travel_gate(spark, sf_dir):
    from survivor_processing_spark.queries.etl import (
        snapshot_time_travel_gate,
    )

    return snapshot_time_travel_gate(spark, sf_dir)


def _ops(spark, sf_dir):
    from survivor_processing_spark.operators.bpe import bpe_token_budget
    from survivor_processing_spark.operators.curation import (
        ngram_coverage_score,
    )
    from survivor_processing_spark.operators.curation import (
        winsorize_group_stats,
    )
    from survivor_processing_spark.operators.retrieval import (
        bm25_doc_term_scores,
        inverted_postings,
    )
    from survivor_processing_spark.operators.dedup import (
        ngram_containment_pairs,
    )
    from survivor_processing_spark.operators.substring import (
        substring_dedup_clean,
    )
    from survivor_processing_spark.operators.collocation import (
        bigram_fluency,
        dice_collocations,
    )
    from survivor_processing_spark.operators.crawlplan import (
        crawl_schedule_summary,
    )
    from survivor_processing_spark.operators.snapshot import (
        commit_version,
        snapshot_summary,
    )
    from survivor_processing_spark.streaming.joins import (
        stream_interval_join,
    )

    def _dml_roundtrip(d_sf):
        # the queued r11 gate's exact shape: stage a 4-file snapshot
        # table from orders (o_orderkey % 4), COW-DELETE a key range,
        # OPTIMIZE ZORDER, summarize every version
        import shutil
        import tempfile

        import pyspark.sql.functions as F

        from survivor_processing_spark.operators.snapshot import (
            snapshot_summary,
            zorder_snapshot,
        )
        from survivor_processing_spark.sinks.merge import (
            delete_from_snapshot,
        )

        d = tempfile.mkdtemp(prefix="sps_dml_bench_")
        o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
        staging = os.path.join(d, "_stage")
        (
            o.withColumn("_g", F.pmod(F.col("o_orderkey"), F.lit(4)))
            .repartition(4, "_g")
            .write.partitionBy("_g")
            .parquet(staging)
        )
        for i in range(4):
            gdir = os.path.join(staging, f"_g={i}")
            part = next(
                p for p in sorted(os.listdir(gdir))
                if p.endswith(".parquet")
            )
            os.rename(
                os.path.join(gdir, part), os.path.join(d, f"p{i}.parquet")
            )
        shutil.rmtree(staging, ignore_errors=True)
        commit_version(d, adds=[f"p{i}.parquet" for i in range(4)])
        b = o.agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).first()
        lo = int(b["lo"])
        hi = lo + (int(b["hi"]) - lo) // 4
        delete_from_snapshot(spark, d, "o_orderkey", lo, hi)
        zorder_snapshot(spark, d, "o_orderkey", "o_custkey", n_files=4)
        out = snapshot_summary(
            spark, d, [1, 2, 3], "o_totalprice"
        ).localCheckpoint(eager=True)
        shutil.rmtree(d, ignore_errors=True)
        return out

    def _mor_roundtrip(d_sf):
        # the queued r11 gate's exact shape (q:snapshot_mor): stage a
        # 4-file snapshot table from orders, two MERGE-ON-READ deletes
        # (sidecar-only commits), purge, summarize every version
        # through the DV-aware read + count the change feed's deletes
        import shutil
        import tempfile

        import pyspark.sql.functions as F

        from survivor_processing_spark.operators.mor import (
            delete_from_snapshot_mor,
            purge_dvs,
            table_changes,
        )
        from survivor_processing_spark.operators.snapshot import (
            snapshot_summary,
        )

        d = tempfile.mkdtemp(prefix="sps_mor_bench_")
        o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
        staging = os.path.join(d, "_stage")
        (
            o.withColumn("_g", F.pmod(F.col("o_orderkey"), F.lit(4)))
            .repartition(4, "_g")
            .write.partitionBy("_g")
            .parquet(staging)
        )
        for i in range(4):
            gdir = os.path.join(staging, f"_g={i}")
            part = next(
                p for p in sorted(os.listdir(gdir))
                if p.endswith(".parquet")
            )
            os.rename(
                os.path.join(gdir, part), os.path.join(d, f"p{i}.parquet")
            )
        shutil.rmtree(staging, ignore_errors=True)
        commit_version(d, adds=[f"p{i}.parquet" for i in range(4)])
        b = o.agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).first()
        lo = int(b["lo"])
        span = int(b["hi"]) - lo
        delete_from_snapshot_mor(spark, d, "o_orderkey", lo, lo + span // 4)
        delete_from_snapshot_mor(
            spark, d, "o_orderkey", lo + span // 8, lo + span // 3
        )
        v4 = purge_dvs(spark, d, stats_cols=["o_orderkey"])["version"]
        summary = snapshot_summary(
            spark, d, [1, 2, 3, v4], "o_totalprice"
        )
        feed = (
            table_changes(spark, d, 1, v4)
            .groupBy("_commit_version")
            .agg(F.count(F.lit(1)).alias("n_feed_deletes"))
        )
        out = summary.join(
            feed,
            summary["version"] == feed["_commit_version"],
            "left",
        ).select(
            "version",
            "n_rows",
            "total",
            # versions with no feed rows (v1 below the range, the
            # purge skipped as data_change=False) must read 0, not
            # NULL — the closed-form oracle emits 0 for them
            F.coalesce(F.col("n_feed_deletes"), F.lit(0))
            .cast("long")
            .alias("n_feed_deletes"),
        ).localCheckpoint(eager=True)
        shutil.rmtree(d, ignore_errors=True)
        return out

    def _stream_ingest(d_sf):
        # the queued r11 gate's shape: two event slices stream into a
        # fresh snapshot table (bootstrap + merge commits), read back
        import shutil
        import tempfile

        import pyspark.sql.functions as F

        from survivor_processing_spark.operators.snapshot import (
            read_snapshot,
        )
        from survivor_processing_spark.streaming.lakehouse import (
            stream_into_snapshot,
        )

        root = tempfile.mkdtemp(prefix="sps_stream_bench_")
        src = os.path.join(root, "src")
        ev = events.select("event_id", "user_id", "event_type")
        for i in range(2):
            ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
                os.path.join(src, f"half_{i}")
            )
            part = next(
                p
                for p in sorted(os.listdir(os.path.join(src, f"half_{i}")))
                if p.endswith(".parquet")
            )
            os.rename(
                os.path.join(src, f"half_{i}", part),
                os.path.join(src, f"h{i}.parquet"),
            )
            shutil.rmtree(
                os.path.join(src, f"half_{i}"), ignore_errors=True
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_into_snapshot(
            stream,
            os.path.join(root, "tbl"),
            "event_id",
            os.path.join(root, "ck"),
        )
        q.awaitTermination()
        out = read_snapshot(
            spark, os.path.join(root, "tbl")
        ).localCheckpoint(eager=True)
        shutil.rmtree(root, ignore_errors=True)
        return out

    def _snapshot_fixture(d_sf=None):
        # two symlinked "files" over the existing orders parquet + a
        # two-commit log: v2 = compaction-style swap of f1 for f2
        import tempfile

        d = tempfile.mkdtemp(prefix="sps_snap_bench_")
        src = os.path.abspath(f"{sf_dir}/orders.parquet")
        os.symlink(src, os.path.join(d, "f1.parquet"))
        os.symlink(src, os.path.join(d, "f2.parquet"))
        commit_version(d, adds=["f1.parquet"])
        commit_version(d, adds=["f2.parquet"], removes=["f1.parquet"])
        return d

    from survivor_processing_spark.operators.fingerprint import (
        content_fingerprint,
    )
    from survivor_processing_spark.operators.curation import (
        k_anonymity_stats,
        mad_outlier_stats,
    )
    from survivor_processing_spark.operators.funnel import funnel_steps
    from survivor_processing_spark.operators.sharding import (
        rendezvous_summary,
    )
    from survivor_processing_spark.operators.textnorm import (
        nfc_normalize_text,
    )
    from survivor_processing_spark.operators.timeseries import (
        interpolate_linear,
    )
    from survivor_processing_spark.operators.mojibake import (
        mojibake_stats,
    )
    from survivor_processing_spark.operators.scripts import (
        script_mix_stats,
    )
    from survivor_processing_spark.operators.urlnorm import url_canonicalize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = orders.selectExpr("o_custkey AS src", "o_orderkey % 100000 AS dst")
    return {
        "substring_clean": lambda: substring_dedup_clean(docs, n=8),
        "containment": lambda: ngram_containment_pairs(
            docs, "text", "doc_id", 0.5
        ),
        "bpe_token_budget": lambda: bpe_token_budget(docs, n_merges=8),
        "ngram_coverage": lambda: ngram_coverage_score(docs, n=2),
        "inverted_postings": lambda: inverted_postings(
            docs, min_df=2, max_df=2000
        ),
        "bm25_scores": lambda: bm25_doc_term_scores(docs),
        "interpolate": lambda: interpolate_linear(
            orders.selectExpr(
                "o_custkey AS k",
                "o_orderkey AS t",
                "if(o_orderkey % 3 = 0, NULL,"
                " cast(o_totalprice * 100 as bigint)) AS yq",
            ),
            ["k"],
            "t",
            "yq",
        ),
        "winsorize": lambda: winsorize_group_stats(
            events.selectExpr(
                "event_type AS g", "cast(value * 1000 as bigint) AS v"
            ),
            ["g"],
            "v",
        ),
        "collocations": lambda: dice_collocations(docs, min_count=2),
        "mad_outliers": lambda: mad_outlier_stats(
            events.selectExpr(
                "event_type AS g", "cast(value * 1000 as bigint) AS v"
            ),
            ["g"],
            "v",
        ),
        "k_anonymity": lambda: k_anonymity_stats(
            orders.selectExpr(
                "o_orderpriority AS p", "o_custkey % 500 AS c"
            ),
            ["p", "c"],
            3,
        ),
        "funnel_steps": lambda: funnel_steps(
            events,
            "user_id",
            "ts",
            [
                ("view", "event_type = 'view'"),
                ("click", "event_type = 'click'"),
                ("purchase", "event_type = 'purchase'"),
            ],
        ),
        "url_canonicalize": lambda: url_canonicalize(
            docs.selectExpr(
                "concat('HTTP://', source, '.com:80/', doc_id % 50,"
                " '/?utm_source=x&b=', doc_id % 7, '#f') AS url"
            )
        ),
        "nfc_normalize": lambda: nfc_normalize_text(docs),
        "bigram_fluency": lambda: bigram_fluency(docs),
        "rendezvous": lambda: rendezvous_summary(
            docs.select("doc_id"), "doc_id", [f"s-{i}" for i in range(16)]
        ),
        "content_fingerprint": lambda: content_fingerprint(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
        ),
        "crawl_schedule": lambda: crawl_schedule_summary(
            docs.selectExpr(
                "concat('h', doc_id % 97, '.com') AS host",
                "concat('/', doc_id) AS url",
            ),
            per_slot=4,
        ),
        "stream_interval_join": lambda: stream_interval_join(
            events.selectExpr(
                "user_id", "event_id AS view_id", "ts AS view_ts"
            ).filter("view_id % 3 = 0"),
            events.selectExpr(
                "user_id", "event_id AS click_id", "ts AS click_ts"
            ).filter("click_id % 3 = 1"),
            keys=["user_id"],
            left_ts="view_ts",
            right_ts="click_ts",
            upper="1 hour",
        ),
        "snapshot_read": lambda: snapshot_summary(
            spark, _snapshot_fixture(sf_dir), [1, 2], "o_totalprice"
        ),
        "snapshot_dml": lambda: _dml_roundtrip(sf_dir),
        "snapshot_mor": lambda: _mor_roundtrip(sf_dir),
        "stream_snapshot_ingest": lambda: _stream_ingest(sf_dir),
        # queued r12 (VERDICT r11 #4/#5): the gate bodies themselves
        # — driver-shaped cost, measured before registration
        "snapshot_mor_upsert": lambda: _mor_upsert_gate(spark, sf_dir),
        "snapshot_time_travel": lambda: _time_travel_gate(spark, sf_dir),
        # queued r12 net-new: DSIR importance lanes, target = the
        # corpus's own English slice
        "dsir_weights": lambda: _dsir_weights(
            docs, docs.filter("lang = 'en'")
        ),
        # queued r12 net-new: boilerplate paragraph strip over the
        # same derived-paragraph corpus the paragraph_dedup gate uses
        "boilerplate_strip": lambda: _boilerplate_strip(docs),
        # queued r13 net-new: encoding-damage stats (map-only
        # projection; damage planted on deterministic slices)
        "mojibake": lambda: mojibake_stats(
            docs.selectExpr(
                "doc_id",
                "concat(text, case cast(doc_id % 4 as int)"
                " when 0 then '' when 1 then ' cafÃ© visit'"
                " when 2 then ' lost \uFFFD char'"
                " else ' donâ€™t' end) AS text"
            )
        ),
        # queued r13 net-new: script-composition stats (map-only
        # projection; suffixes planted so every class fires)
        "script_mix": lambda: script_mix_stats(
            docs.selectExpr(
                "doc_id",
                "concat(text, case cast(doc_id % 5 as int)"
                " when 0 then '' when 1 then ' Привет мир'"
                " when 2 then ' 汉字文本' when 3 then ' αβγ δεζ'"
                " else ' カタカナ' end) AS text"
            )
        ),
    }


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("bench-queued")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for d in sf_dirs:
        out[d] = {}
        for name, build in _ops(spark, d).items():
            t0 = time.perf_counter()
            _execute(build())
            out[d][name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "queued_operators_single_rep",
                "sf_dirs": out,
                "round": int(os.environ.get("SPARK_GRAFT_ROUND", 0)),
                "loadavg": list(os.getloadavg()),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
