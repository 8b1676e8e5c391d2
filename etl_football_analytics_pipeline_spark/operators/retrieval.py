"""Hybrid retrieval: BM25 candidate generation → exact embedding
rerank.

The production retrieval stack of an LLM-data pipeline is two-stage:
a cheap lexical pass bounds the candidate set (BM25 over the inverted
index — operators/text.py), then a dense scorer reranks only those
candidates (exact cosine against the query embedding). This module is
the composition glue; no reference counterpart (training-data
extension surface, like the rest of the retrieval tier).

100 TB shape: stage 1 does the corpus-sized work with BM25's
bucket-pruned probe; stage 2 touches exactly |queries| × k ×
oversample rows — the candidate frame is BROADCAST into the embedding
join (never the reverse), and the cosine kernel sees only candidate
vectors, so rerank cost is independent of corpus size.
"""

from __future__ import annotations

from typing import Iterator, Mapping

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .text import bm25_topk

__all__ = ["hybrid_topk"]


def hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    queries: Mapping[str, dict],
    k: int = 10,
    oversample: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    index_dir: str | None = None,
) -> DataFrame:
    """Two-stage retrieval. ``queries`` maps query_id → {"terms":
    [str, ...], "vec": [float, ...]} — or {"terms": ..., "vec_id": n}
    to take the query vector FROM ``emb`` (one bounded |Q|-row collect
    here in the operator, the same discipline as ivf_search_index's
    driver-side probe assignment): BM25 takes the terms, the rerank
    takes the (unit-normalized here) vector.

    Stage 1: ``bm25_topk`` keeps the lexical top-(k × oversample) per
    query. Stage 2: candidates join their embeddings (candidate side
    broadcast — it is |Q| × k × oversample rows by construction) and
    score exact cosine against the query vector in one Arrow batch
    kernel; the final per-query window orders by (cosine desc, id asc)
    — the repo's deterministic ranking discipline — and keeps k.

    Returns (query_id, ``id_col``, bm25_rank, cosine, rank). A
    candidate with no embedding row is dropped (inner join) — surface
    them by left-joining the result back onto the stage-1 frame if the
    gap matters.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    terms = {qid: spec["terms"] for qid, spec in queries.items()}
    if index_dir is not None:
        # serve stage 1 from the persisted inverted index (identical
        # results by bm25's shared-scoring-tail construction; the
        # probe reads term buckets, not the corpus)
        from .text import bm25_search_index

        cand = bm25_search_index(
            docs.sparkSession, index_dir, terms, k=k * oversample, id_col=id_col
        )
    else:
        cand = bm25_topk(docs, id_col, text_col, terms, k=k * oversample)
    cand = cand.withColumnRenamed("rank", "bm25_rank").drop("score")

    by_id = {
        qid: spec["vec_id"] for qid, spec in queries.items() if "vec" not in spec
    }
    fetched = {}
    if by_id:
        rows = (
            emb.filter(F.col(emb_id_col).isin(list(by_id.values())))
            .select(F.col(emb_id_col).alias("qid"), F.col(vec_col).alias("v"))
            .collect()
        )
        vec_of = {int(r["qid"]): [float(x) for x in r["v"]] for r in rows}
        missing = sorted(v for v in by_id.values() if int(v) not in vec_of)
        if missing:
            raise ValueError(f"query vec_ids absent from emb: {missing}")
        fetched = {qid: vec_of[int(v)] for qid, v in by_id.items()}
    qvecs = {}
    for qid, spec in sorted(queries.items()):
        v = np.asarray(spec.get("vec", fetched.get(qid)), dtype=np.float64)
        n = np.linalg.norm(v)
        qvecs[qid] = v / n if n > 0 else v
    bq = docs.sparkSession.sparkContext.broadcast(qvecs)

    joined = emb.select(
        F.col(emb_id_col).alias(id_col), F.col(vec_col).alias("__vec")
    ).join(F.broadcast(cand), id_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qv = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat = mat / norms[:, None]
            # one matvec per query group — no per-row Python
            cos = np.empty(len(pdf), dtype=np.float64)
            for q, idx in pdf.groupby("query_id").indices.items():
                cos[idx] = mat[idx] @ qv[q]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    id_col: pdf[id_col],
                    "bm25_rank": pdf["bm25_rank"],
                    "cosine": np.round(cos, round_to),
                }
            )

    scored = joined.mapInPandas(
        score,
        f"query_id string, {id_col} long, bm25_rank int, cosine double",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "bm25_rank", "cosine", "rank")
    )
