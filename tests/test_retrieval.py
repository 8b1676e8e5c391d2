"""Hybrid retrieval (operators/retrieval.hybrid_topk): BM25 candidates
reranked by exact embedding cosine."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.retrieval import hybrid_topk
from etl_football_analytics_pipeline_spark.operators.text import bm25_topk
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _queries(spark):
    emb = load_table(spark, SF, "embeddings")
    vecs = {r.vec_id: list(r.embedding) for r in emb.filter(F.col("vec_id") < 2).collect()}
    return {
        "q1": {"terms": ["hash", "join", "stream"], "vec": vecs[0]},
        "q2": {"terms": ["vector", "scan", "merge"], "vec": vecs[1]},
    }


def test_hybrid_is_rerank_of_bm25_candidates(spark):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    queries = _queries(spark)
    k, ovs = 5, 4
    out = hybrid_topk(docs, emb, queries, k=k, oversample=ovs).collect()
    cand = bm25_topk(
        docs, "doc_id", "text", {q: s["terms"] for q, s in queries.items()}, k=k * ovs
    ).collect()
    cand_set = {(r.query_id, r.doc_id) for r in cand}
    assert out, "empty hybrid result"
    for r in out:
        assert (r.query_id, r.doc_id) in cand_set
    # per query: ranks contiguous from 1, ordered by (cosine desc, id asc)
    for q in queries:
        rows = sorted((r for r in out if r.query_id == q), key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.cosine, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_hybrid_cosines_match_manual(spark):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    queries = _queries(spark)
    out = hybrid_topk(docs, emb, queries, k=5).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}

    def unit(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    for r in out:
        want = float(unit(vecs[r.doc_id]) @ unit(np.asarray(queries[r.query_id]["vec"], dtype=np.float64)))
        assert abs(r.cosine - round(want, 4)) < 1e-9, (r, want)


def test_hybrid_deterministic_under_repartition(spark):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    queries = _queries(spark)
    a = sorted(map(tuple, hybrid_topk(docs, emb, queries, k=5).collect()))
    b = sorted(
        map(tuple, hybrid_topk(docs.repartition(7), emb.repartition(5), queries, k=5).collect())
    )
    assert a == b


def test_hybrid_vec_id_spec_equals_literal_vec(spark):
    """{"vec_id": n} specs resolve from the embedding frame inside the
    operator (bounded |Q|-row collect) and match literal-vec results;
    absent ids fail loudly."""
    import pytest

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    lit = _queries(spark)
    by_id = {
        "q1": {"terms": lit["q1"]["terms"], "vec_id": 0},
        "q2": {"terms": lit["q2"]["terms"], "vec_id": 1},
    }
    a = sorted(map(tuple, hybrid_topk(docs, emb, lit, k=5).collect()))
    b = sorted(map(tuple, hybrid_topk(docs, emb, by_id, k=5).collect()))
    assert a == b
    with pytest.raises(ValueError, match="absent"):
        hybrid_topk(
            docs, emb,
            {"q": {"terms": ["hash"], "vec_id": 99_999_999}}, k=5,
        ).collect()


def test_hybrid_index_backed_equals_inflight(spark, tmp_path):
    from etl_football_analytics_pipeline_spark.operators.text import bm25_build_index

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    queries = _queries(spark)
    idx = f"{tmp_path}/idx"
    bm25_build_index(docs, "doc_id", "text", idx)
    a = sorted(map(tuple, hybrid_topk(docs, emb, queries, k=5).collect()))
    b = sorted(
        map(tuple, hybrid_topk(docs, emb, queries, k=5, index_dir=idx).collect())
    )
    assert a == b
