"""Reproducibly derive the pinned PQ codebooks used by the registered
`ann_cosine_topk` 'pq' part (see plans/ivf_model.py for why models are
frozen: training is iterative/seeded, but encoding + ADC search with a
fixed codebook are pure relational algebra the oracle can replay).

Config: m=4 subspaces × 16 codes × 16 dims (dim=64) — small enough to
embed as SQL literals, enough quantization structure for a meaningful
recall test. Run: python scripts/pin_pq_codebooks.py > body.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_football_analytics_pipeline_spark.operators.similarity import (
    pq_train_codebooks,
)
from etl_football_analytics_pipeline_spark.session import get_spark
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="pin-pq", master="local[8]", shuffle_partitions=8)
    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train_codebooks(emb, "vec_id", "embedding", m=4, n_codes=16, seed=42)
    print("PQ_CODEBOOKS = (")
    for j in range(books.shape[0]):
        print("    (")
        for c in range(books.shape[1]):
            print(
                "        ("
                + ", ".join(repr(float(x)) for x in books[j, c])
                + "),"
            )
        print("    ),")
    print(")")


if __name__ == "__main__":
    main()
