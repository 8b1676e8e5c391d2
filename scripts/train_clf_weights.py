"""Reproducibly derive the PINNED quality-classifier weights used by
the registered `corpus_mixture_suite` 'clf' leg.

The driver's correctness gate needs a deterministic, DuckDB-mirrorable
computation, and training itself is iterative (not SQL-expressible),
so the registered leg scores with a FIXED literal weight vector — the
same precedent as the embedded LSH planes / minhash coefficients. This
script is the provenance of those literals:

- features: portable hashed bag-of-words (md5-derived token buckets,
  the engine-reproducible family from operators.dedup), dim=32;
- labels:   the fastText/DCLM recipe at miniature scale — "reference"
  docs (stopword_ratio above the corpus median, i.e. natural-ish
  prose) = 1, the rest = 0. The label rule only matters for training;
  the registered leg value-checks SCORING, corpus-wide;
- training: quality_train (full-batch GD, executor-merged partials)
  at sf0.01, iters=300 — bit-deterministic for this fixed layout.

Run: python scripts/train_clf_weights.py  → prints the literal tuple
to paste into plans/llm_ops.py::CLF_WEIGHTS.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.classifier import quality_train
from etl_football_analytics_pipeline_spark.operators.text import quality_scores
from etl_football_analytics_pipeline_spark.session import get_spark
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.01"
DIM = 32


def main() -> None:
    spark = get_spark(app_name="train-clf", master="local[8]", shuffle_partitions=8)
    docs = load_table(spark, SF_DIR, "documents")
    q = quality_scores(docs, "doc_id", "text")
    med = q.approxQuantile("stopword_ratio", [0.5], 0.0)[0]
    labeled = (
        docs.join(q.select("doc_id", "stopword_ratio"), "doc_id")
        .select(
            "doc_id",
            "text",
            (F.col("stopword_ratio") > F.lit(med)).cast("long").alias("label"),
        )
        # one partition → one deterministic batch layout for the pin
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )
    w = quality_train(
        labeled, "text", "label", dim=DIM, iters=300, lr=2.0, reg=1e-4, portable=True
    )
    print(f"# median stopword_ratio at {SF_DIR}: {med!r}")
    print("CLF_WEIGHTS = (")
    for i in range(0, len(w), 4):
        print("    " + ", ".join(repr(float(x)) for x in w[i : i + 4]) + ",")
    print(")")


if __name__ == "__main__":
    main()
