"""Solo steady-state bench — one registry entry, fresh session, N runs.

The round bench (`bench.py`) times all ~50 registry entries inside one
shared session: the right number for the driver record, but per-query
figures carry cross-query session noise (heap shaped by the previous
query, ContextCleaner backlog, block-manager churn). Earlier rounds
argued "solo steady-state is X s" from ad-hoc prose runs; this makes
that claim MECHANICAL (verdict r7 directive 4): each requested entry
gets its own fresh SparkSession (previous one stopped), the standard
bench warmup, N timed runs, and the samples land in a
``BENCH_solo.json`` sidecar that BASELINE.md can cite by name.

Usage:
    python scripts/solo_bench.py sketch_suite dedup_minhash_suite
    python scripts/solo_bench.py --runs 5 text_ngram_suite
    python scripts/solo_bench.py --top 5          # 5 heaviest entries
                                                  # per the last
                                                  # BENCH_passes.json

Appends (merges by entry name) into BENCH_solo.json:
    {"<entry>": {"runs": [..s..], "min": s, "sf": 0.1,
                 "loadavg_start": l1, "stamp": "..."}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_football_analytics_pipeline_spark.plans import QUERIES  # noqa: E402
from etl_football_analytics_pipeline_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIDECAR = os.path.join(ROOT, "BENCH_solo.json")


def _warmup(spark, sf_dir: str) -> None:
    # same one-time-cost absorption as bench.py: parquet reader +
    # codegen JIT, python-worker fork with numpy preloaded
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _noop(batches):
        import numpy  # noqa: F401

        yield from batches

    (
        spark.range(0, 1000, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_noop, "id long")
        .count()
    )


def _heaviest(k: int) -> list[str]:
    """The k slowest entries per the round bench's sidecar (falls back
    to the official BENCH record when no sidecar exists)."""
    for cand in ("BENCH_passes.json",):
        p = os.path.join(ROOT, cand)
        if os.path.exists(p):
            with open(p) as fh:
                timings = json.load(fh)["queries"]
            return sorted(timings, key=lambda n: -timings[n])[:k]
    raise SystemExit("no BENCH_passes.json to rank entries; name them explicitly")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*", help="registry entry names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=0,
                    help="bench the N heaviest entries from the last round record")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.entries)
    if args.top:
        names += [n for n in _heaviest(args.top) if n not in names]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown entries {unknown}; registry has {sorted(QUERIES)}")
    if not names:
        raise SystemExit("name at least one entry (or --top N)")
    try:
        sf = float(os.path.basename(args.sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    results: dict[str, dict] = {}
    if os.path.exists(SIDECAR):
        with open(SIDECAR) as fh:
            results = json.load(fh)

    # the same bounded quiet-wait as bench.py (r9, VERDICT r8 #4): the
    # r8 sidecar was re-recorded inside a steal burst (loadavg_start
    # 8-12) and contradicted the prose citing it — the sidecar exists
    # to REPLACE prose with evidence, so its own recording must gate on
    # a quiet window and stamp what it actually got
    wait_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_LOAD", "1.0"))
    wait_max = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_MAX", "600"))
    waited = 0.0
    while os.getloadavg()[0] > wait_thresh and waited < wait_max:
        time.sleep(10)
        waited += 10

    for name in names:
        # FRESH session per entry — the point of the exercise: no heap,
        # cache, or cleaner state inherited from any other query
        active = None
        try:
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
        except Exception:  # noqa: BLE001
            pass
        if active is not None:
            active.stop()
            time.sleep(2)  # let executors/cleaner threads die down
        # PER-ENTRY quiet gate: the previous entry's own 32-thread
        # burst rides the 1-minute loadavg for ~a minute after its
        # session stops, so a single up-front wait leaves every entry
        # after the first stamped "contended" by our own decay (the
        # r8 sidecar's 8-12 stamps) — wait it out before each entry so
        # loadavg_start means what a reader assumes it means
        waited_e = 0.0
        while os.getloadavg()[0] > wait_thresh and waited_e < wait_max / 2:
            time.sleep(10)
            waited_e += 10
        spark = get_spark(app_name=f"solo-{name}")
        load0 = round(os.getloadavg()[0], 2)
        _warmup(spark, args.sf_dir)
        runs = []
        for i in range(args.runs):
            t0 = time.time()
            n_rows = len(QUERIES[name](spark, args.sf_dir).collect())
            el = round(time.time() - t0, 3)
            runs.append(el)
            print(f"# {name} run{i} {el:8.3f}s n={n_rows}", file=sys.stderr)
            spark.catalog.clearCache()
        spark.stop()
        results[name] = {
            "runs": runs,
            "min": min(runs),
            "sf": sf,
            "loadavg_start": load0,
            "stamp": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        }
        with open(SIDECAR, "w") as fh:  # flush after every entry
            json.dump(results, fh, indent=1, sort_keys=True)

    print(json.dumps({n: results[n]["min"] for n in names}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
