"""Warm plan-build timing for every registered query (r12 tooling).

Measures ONLY fn(spark, sf_dir) — driver-side plan construction plus
any eager actions the function runs — after one warm call per query.
Not part of the driver contract; used to steer/verify the r12 work on
driver-side overheads.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_football_analytics_pipeline_spark.plans import QUERIES
from etl_football_analytics_pipeline_spark.session import get_spark

def main():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark(app_name="planbench")
    spark.read.parquet(f"{sf}/region.parquet").count()
    out = {}
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, sf)  # warm: memos, owned-index builds
            ts = []
            for _ in range(3):
                t0 = time.time(); fn(spark, sf); ts.append(time.time() - t0)
            out[name] = round(min(ts), 3)
        except Exception as exc:
            out[name] = f"ERR {exc}"[:120]
        print(f"{name:35s} {out[name]}", file=sys.stderr, flush=True)
    total = sum(v for v in out.values() if isinstance(v, float))
    print(json.dumps({"plan_build_total": round(total, 3), "queries": out}))
    spark.stop()

if __name__ == "__main__":
    main()
