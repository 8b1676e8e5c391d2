"""Capture .explain("formatted") for named queries to files.

Usage: python scripts/capture_plans.py OUTDIR SUFFIX QUERY [QUERY...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query, using the same
session conf as bench.py (get_spark). Judged evidence for the
optimization rounds: the plan shape claims in OPTIMIZATION_*.md are
checked against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_football_analytics_pipeline_spark.plans import QUERIES  # noqa: E402
from etl_football_analytics_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
