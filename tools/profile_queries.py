"""Profile registered queries: wall time + Spark job/stage counts.

The bench times wall only; this probe additionally counts the driver
jobs and stages a query launches (StatusTracker), which is the
measurement that exposed the snapshot writers' per-commit probe-job
overhead in r13 (wall >> sum(job time) => driver-side gaps; many
1-task jobs => schema-inference / probe reads).  Same methodology as
bench.run_one: warm-up at sf0.001, best-of-3, cache cleared per rep,
noop sink.

Usage: python tools/profile_queries.py <sf_dir> <query> [query ...]
"""

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from survivor_processing_spark import get_spark  # noqa: E402
from survivor_processing_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()
    for name in names:  # warm-up: JVM, codegen, file listing
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    for name in names:
        best = float("inf")
        bj = bs = 0
        for _rep in range(3):
            spark.catalog.clearCache()
            j0 = st.getJobIdsForGroup(None)
            n0 = max(j0) if j0 else -1
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            j1 = st.getJobIdsForGroup(None)
            njobs = len([j for j in j1 if j > n0])
            nst = 0
            for j in j1:
                if j > n0:
                    ji = st.getJobInfo(j)
                    if ji:
                        nst += len(ji.stageIds)
            if dt < best:
                best, bj, bs = dt, njobs, nst
        print(f"{name:32s} best={best:7.3f}s jobs={bj:4d} stages={bs:4d}")


if __name__ == "__main__":
    main()
