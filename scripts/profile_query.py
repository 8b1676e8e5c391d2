"""Per-query profiling harness (optimization rounds).

Runs named registry queries warm in one session, N repetitions each,
prints per-rep wall times, and (with --stages) pulls per-job/stage
metrics from the local UI REST API so the time can be attributed to
specific stages instead of guessed.

Usage:
    python scripts/profile_query.py [--reps 3] [--stages] \
        [--explain DIR] [--sf-dir DIR] name [name ...]

Not part of the driver contract; bench.py remains the official record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_football_analytics_pipeline_spark.plans import QUERIES  # noqa: E402
from etl_football_analytics_pipeline_spark.session import get_spark  # noqa: E402


def _rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--explain", default=None, help="dir to write explain files")
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    extra = {"spark.ui.enabled": "true"} if args.stages else {}
    spark = get_spark(app_name="profile", extra_conf=extra)
    port = int(spark.conf.get("spark.ui.port", "4040")) if args.stages else 0
    # warmup: parquet reader + python workers, same as bench.py
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    def _noop(batches):
        import numpy  # noqa: F401

        yield from batches

    (
        spark.range(0, 1000, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_noop, "id long")
        .count()
    )

    app_id = spark.sparkContext.applicationId
    for name in args.names:
        fn = QUERIES[name]
        times = []
        for rep in range(args.reps):
            jobs_before = set()
            if args.stages:
                jobs_before = {j["jobId"] for j in _rest(port, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t_plan = time.time() - t0
            n = len(df.collect())
            el = time.time() - t0
            times.append(el)
            print(f"{name:32s} rep{rep} {el:7.3f}s (plan-build {t_plan:6.3f}s) n={n}",
                  flush=True)
            spark.catalog.clearCache()
            if args.stages and rep == args.reps - 1:
                jobs = [j for j in _rest(port, f"applications/{app_id}/jobs")
                        if j["jobId"] not in jobs_before]
                jobs.sort(key=lambda j: j["jobId"])
                print(f"  -- {len(jobs)} jobs in last rep --")
                for j in jobs:
                    dur = ""
                    try:
                        from datetime import datetime
                        st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                        ct = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                        dur = f"{(ct - st).total_seconds():7.3f}s"
                    except Exception:
                        pass
                    print(f"  job {j['jobId']:4d} {dur} stages={j['stageIds']} "
                          f"tasks={j['numTasks']:4d} desc={j.get('description', '')[:60]}")
                # stage-level detail for this query's stages
                stages = _rest(port, f"applications/{app_id}/stages?status=complete")
                sids = {s for j in jobs for s in j["stageIds"]}
                mine = [s for s in stages if s["stageId"] in sids]
                mine.sort(key=lambda s: -s.get("executorRunTime", 0))
                for s in mine[:12]:
                    print(f"  stage {s['stageId']:4d} tasks={s['numTasks']:4d} "
                          f"exec={s.get('executorRunTime', 0)/1000:7.2f}s "
                          f"shufR={s.get('shuffleReadBytes', 0)>>10}KiB "
                          f"shufW={s.get('shuffleWriteBytes', 0)>>10}KiB "
                          f"in={s.get('inputBytes', 0)>>10}KiB "
                          f"name={s['name'][:70]}")
        best = min(times)
        print(f"{name:32s} best {best:7.3f}s  all={[round(t, 3) for t in times]}",
              flush=True)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(
                    args.explain, f"{name}_{args.explain_suffix}.txt"), "w") as fh:
                df = QUERIES[name](spark, args.sf_dir)
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
