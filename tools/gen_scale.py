"""Scale-up generator: replicate an sf testdata dir K times with
id-offset copies, preserving referential integrity (FKs offset by the
same per-table stride), so the headline bench can run at ~sf1 without
driver-provided data.

Text/vector columns are deterministically perturbed per copy —
documents get a word ROTATION (3-gram shingle sets diverge, so the
corpus is not 90% planted near-dups) and embeddings a dimension ROLL
(cosine to the original decorrelates) — keeping dedup/ANN benchmarks
realistic instead of measuring an all-duplicates corpus.

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from survivor_processing_spark import TABLES, get_spark  # noqa: E402

KEYS = {  # table -> columns sharing that table's stride
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FKS = {  # table -> {col: stride-source table}
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}
STATIC = ("region", "nation")  # dimensions: never replicated


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sps_scaled"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen-scale")
    # events.ts is nano-precision; read it as a raw long (the catalog
    # applies the same conf + ns->us conversion on load, and a plain
    # INT64 round-trips through that path unchanged)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    strides: dict[str, int] = {}
    for t, cols in KEYS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        strides[t] = int(df.agg(F.max(cols[0])).first()[0]) + 1
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in STATIC:
            df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
            print(f"{t}: copied")
            continue
        rep = df.withColumn(
            "_k", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        for col in KEYS.get(t, []):
            rep = rep.withColumn(col, F.col(col) + F.col("_k") * strides[t])
        for col, ref in FKS.get(t, {}).items():
            rep = rep.withColumn(col, F.col(col) + F.col("_k") * strides[ref])
        if t == "documents":
            rep = rep.withColumn("_w", F.split("text", " ")).withColumn(
                "_r", F.pmod(F.col("_k") * 11, F.greatest(F.size("_w"), F.lit(1)))
            )
            rep = rep.withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', concat(slice(_w, _r + 1, size(_w) - _r),"
                    " slice(_w, 1, _r)))"
                ),
            ).drop("_w", "_r")
        if t == "embeddings":
            rep = rep.withColumn(
                "_r", F.pmod(F.col("_k") * 7, F.size("embedding"))
            )
            rep = rep.withColumn(
                "embedding",
                F.expr(
                    "concat(slice(embedding, _r + 1, size(embedding) - _r),"
                    " slice(embedding, 1, _r))"
                ),
            ).drop("_r")
        rep.drop("_k").write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{copies}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
