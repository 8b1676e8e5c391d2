"""End-to-end corpus curation: quality gate → exact dedup → near-dup
dedup → token accounting, with deterministic keep rules."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day for that"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog and it is a fine night for that"
)
JUNK = "!!! ??? ;;; ::: ,,, ... !!!"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),          # exact dup of 1 → dropped
        (3, NEAR),          # near-dup of 1 → dropped (cluster rep = 1)
        (4, JUNK),          # fails the quality gate
        (5, "completely different text about spark engines and parquet files at scale here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_stages_and_keeps(spark, corpus):
    out, stats = curate_corpus(
        corpus, min_quality=0.3, jaccard_threshold=0.5, with_stats=True
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 5]
    assert stats.input_docs == 5
    assert stats.after_quality == 4       # junk gone
    assert stats.after_exact_dedup == 3   # exact dup gone
    assert stats.after_neardup_dedup == 2 # near-dup gone, lowest id kept
    assert stats.total_tokens > 0


def test_curation_deterministic_under_repartition(spark, corpus):
    a = sorted(r.doc_id for r in curate_corpus(corpus).collect())
    b = sorted(r.doc_id for r in curate_corpus(corpus.repartition(7)).collect())
    assert a == b


def test_repetition_gate_drops_loopy_doc(spark, corpus):
    loopy = corpus.union(
        corpus.sparkSession.createDataFrame(
            [(6, "buy now buy now buy now buy now buy now buy now and the a of")],
            "doc_id long, text string",
        )
    )
    # without the gate the loopy doc survives (has stopwords → quality ok)
    plain = sorted(r.doc_id for r in curate_corpus(loopy).collect())
    assert 6 in plain
    gated = sorted(
        r.doc_id
        for r in curate_corpus(loopy, max_top_word_frac=0.25).collect()
    )
    assert 6 not in gated
    assert [d for d in gated if d != 6] == [d for d in plain if d != 6]


def test_curation_idempotent(spark, corpus):
    once = curate_corpus(corpus).select("doc_id", "text")
    twice = curate_corpus(once)
    assert sorted(r.doc_id for r in twice.collect()) == sorted(
        r.doc_id for r in once.collect()
    )
