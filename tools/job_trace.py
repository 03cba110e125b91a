"""Trace a registered query's driver jobs: per-job name, duration,
task count, and the driver-side GAP before each job (submission time
minus the previous job's completion) — the number that separates
executor work from driver orchestration (planning, schema inference,
commit protocol, collect).  Requires the UI (spark.ui.enabled=true,
forced here) and reads it back via the REST API on localhost.

Usage: python tools/job_trace.py <sf_dir> <query> [query ...]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_UI"] = "1"  # get_spark honors this to enable the UI

from survivor_processing_spark import get_spark  # noqa: E402
from survivor_processing_spark.queries import REGISTRY  # noqa: E402


def _api(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("jobtrace")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("UI disabled; cannot trace", file=sys.stderr)
        sys.exit(1)
    app = _api(f"{ui}/api/v1/applications")[0]["id"]
    st = spark.sparkContext.statusTracker()
    for name in names:  # warm-up
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    for name in names:
        spark.catalog.clearCache()
        j0 = st.getJobIdsForGroup(None)
        n0 = max(j0) if j0 else -1
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in _api(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded")
            if j["jobId"] > n0
        ]
        jobs.sort(key=lambda j: j["jobId"])
        fmt = "%H:%M:%S.%f"
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s.split("GMT")[0], "%Y-%m-%dT%H:%M:%S.%f")

        total_job = 0.0
        prev_end = None
        print(f"=== {name}  wall={wall:.3f}s  njobs={len(jobs)}")
        for j in jobs:
            sub = ts(j["submissionTime"])
            end = ts(j["completionTime"])
            dur = (end - sub).total_seconds()
            gap = (sub - prev_end).total_seconds() if prev_end else 0.0
            prev_end = end
            total_job += dur
            nm = j["name"][:70]
            print(
                f"  job {j['jobId']:5d} gap={gap:7.3f} dur={dur:7.3f} "
                f"tasks={j['numTasks']:4d} {nm}"
            )
        print(f"  sum(job dur)={total_job:.3f}s  wall-sum={wall-total_job:.3f}s")


if __name__ == "__main__":
    main()
