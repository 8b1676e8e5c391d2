"""Supervised quality classification — the fastText/DCLM-style gate.

A large-scale curation pipeline's fourth quality signal (after the
heuristic scores, repetition stats, and the n-gram LM in
operators.text): a LINEAR classifier over hashed bag-of-words
features, trained on a labeled sample (the standard recipe labels a
reference corpus 1 and raw crawl 0) and then scored corpus-wide as a
keep/drop gate. The reference pipeline has no ML stage; this belongs
to the driver-mandated LLM-pipeline extensions (SURVEY.md §2.10).

Spark-first split of work, same discipline as the dedup kernels:

- **Featurization** is map-only: the JVM codegens one xxhash64 per
  token (cheapest 64-bit hash Spark has), and an Arrow-batched numpy
  kernel folds the token hashes into an L1-normalized hashed
  bag-of-words histogram (`dim` buckets + bias). ZERO shuffle — a
  document's features never leave its row.
- **Training** is full-batch gradient descent driven from the driver:
  each iteration is ONE job that maps the feature frame to per-batch
  gradient PARTIALS (a `dim+1` vector and a count per Arrow batch)
  and collects only those partials — driver state is
  O(batches × dim), never O(rows). Gradients are summed in sorted
  batch order, so training is bit-deterministic for a fixed input
  layout. At 100 TB you train on a bounded labeled sample anyway
  (labels are the scarce resource); scoring is the corpus-wide pass.
- **Scoring** is map-only again: broadcast the weight vector
  (`dim+1` doubles — O(1) in the corpus), sigmoid of one dot product
  per document. Feeds `pipeline.llm_corpus.curate_corpus`-style
  gates the same way quality_scores does.

No MLlib dependency: the model is a numpy vector and every data-path
stage is the engine's own kernel pattern (mapInPandas over
Arrow batches), so the operator composes with the rest of the
pipeline and its plans stay inspectable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import spread
from .dedup import normalized_text

__all__ = [
    "hashed_bow",
    "quality_train",
    "quality_score",
    "quality_gate",
]


def _token_hashes(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(…id_cols, __h array<long>): one xxhash64 per token, JVM-side."""
    return (
        spread(df)
        .withColumn("__words", F.split(normalized_text(text_col), " "))
        .select(*id_cols, F.expr("transform(__words, w -> xxhash64(w))").alias("__h"))
    )


def _bow_rows(pdf: pd.DataFrame, dim: int) -> np.ndarray:
    """Rows × (dim+1) L1-normalized histogram matrix with a bias slot.
    Vectorized: ONE flattened bincount over the whole batch (segment
    offsets separate documents), no per-document python loop."""
    lens = pdf["__h"].map(len).to_numpy()
    n = len(pdf)
    out = np.zeros((n, dim + 1), dtype=np.float64)
    out[:, dim] = 1.0  # bias
    if lens.sum() == 0:
        return out
    flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in pdf["__h"]])
    buckets = (flat.view(np.uint64) % np.uint64(dim)).astype(np.int64)
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount(seg * dim + buckets, minlength=n * dim).reshape(n, dim)
    totals = np.maximum(lens, 1)[:, None]
    out[:, :dim] = counts / totals
    return out


def hashed_bow(
    df: DataFrame, id_col: str, text_col: str, dim: int = 2048
) -> DataFrame:
    """(id, features array<double>) — the hashed bag-of-words features
    the classifier trains and scores on, exposed for inspection and
    for composing with other vector operators (e.g. the similarity
    family). Map-only; the dense row is `dim+1` doubles (last = bias).
    """
    hashed = _token_hashes(df, [id_col], text_col)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _bow_rows(pdf, dim)
            yield pd.DataFrame({id_col: pdf[id_col], "features": list(mat)})

    return hashed.mapInPandas(feats, f"{id_col} long, features array<double>")


def quality_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    dim: int = 2048,
    iters: int = 60,
    lr: float = 2.0,
    reg: float = 1e-4,
) -> np.ndarray:
    """Train the logistic-regression quality model. Returns the weight
    vector (`dim+1` float64, last = bias).

    Full-batch GD: per iteration ONE distributed job computes
    per-Arrow-batch partials ``(X_b^T (σ(X_b w) − y_b), |b|)`` and the
    driver sums them (sorted by an emitted batch key for
    bit-determinism) — driver state O(batches × dim). L2 `reg`
    excludes the bias. `lr` is scaled by 1/n via the collected counts,
    so the default works across corpus sizes."""
    hashed = _token_hashes(df, [label_col], text_col).persist()
    w_len = dim + 1
    try:
        spark = df.sparkSession
        w = np.zeros(w_len, dtype=np.float64)
        for _ in range(iters):
            bw = spark.sparkContext.broadcast(w)

            def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                wv = bw.value
                for pdf in batches:
                    if pdf.empty:
                        continue
                    x = _bow_rows(pdf, dim)
                    y = pdf[label_col].to_numpy(dtype=np.float64)
                    p = 1.0 / (1.0 + np.exp(-(x @ wv)))
                    g = x.T @ (p - y)
                    # one deterministic sort key per batch: the lowest
                    # row fingerprint in the batch (content-derived, so
                    # the same layout always sums in the same order)
                    mins = [
                        int(np.min(np.asarray(h, dtype=np.int64)))
                        for h in pdf["__h"]
                        if len(h)
                    ]
                    key = min(mins) if mins else 0
                    yield pd.DataFrame(
                        {"bkey": [key], "grad": [g], "n": [float(len(pdf))]}
                    )

            rows = hashed.mapInPandas(
                partials, "bkey long, grad array<double>, n double"
            ).collect()
            rows.sort(key=lambda r: (r.bkey, r.n))
            n_total = sum(r.n for r in rows) or 1.0
            grad = np.zeros(w_len, dtype=np.float64)
            for r in rows:
                grad += np.asarray(r.grad, dtype=np.float64)
            grad /= n_total
            grad[:dim] += reg * w[:dim]  # L2, bias excluded
            w = w - lr * grad
            bw.destroy()
        return w
    finally:
        hashed.unpersist()


def quality_score(
    df: DataFrame,
    weights: np.ndarray,
    id_col: str,
    text_col: str,
    dim: int | None = None,
    out: str = "quality_prob",
) -> DataFrame:
    """(id, quality_prob) — σ(features · w) per document. Map-only;
    the weight vector is broadcast (O(1) in the corpus)."""
    dim = (len(weights) - 1) if dim is None else dim
    spark = df.sparkSession
    bw = spark.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))
    hashed = _token_hashes(df, [id_col], text_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wv = bw.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = _bow_rows(pdf, dim)
            p = 1.0 / (1.0 + np.exp(-(x @ wv)))
            yield pd.DataFrame({id_col: pdf[id_col], out: p})

    return hashed.mapInPandas(score, f"{id_col} long, {out} double")


def quality_gate(
    df: DataFrame,
    weights: np.ndarray,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Keep documents the classifier scores ≥ threshold — the corpus
    gate form (join back on id so the full document row survives)."""
    kept = quality_score(df, weights, id_col, text_col).filter(
        F.col("quality_prob") >= threshold
    )
    return df.join(kept.select(id_col, "quality_prob"), id_col)
