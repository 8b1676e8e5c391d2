"""Reproducibly derive the pinned IVF quantizer in
`plans/ivf_model.py` (see that module's docstring for why it is
frozen). Run: python scripts/pin_ivf_centroids.py > new_model_body.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_football_analytics_pipeline_spark.operators.similarity import (
    kmeans_centroids,
)
from etl_football_analytics_pipeline_spark.session import get_spark
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="pin-ivf", master="local[8]", shuffle_partitions=8)
    emb = load_table(spark, SF_DIR, "embeddings")
    c = kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=8, seed=42)
    print("IVF_CENTROIDS = (")
    for row in c:
        print("    (" + ", ".join(repr(float(x)) for x in row) + "),")
    print(")")


if __name__ == "__main__":
    main()
