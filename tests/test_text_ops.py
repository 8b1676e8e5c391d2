"""Text-operator invariants not covered by the SQL oracle (the
xxhash64 shard key is Spark-specific) plus determinism checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.text import (
    fingerprints,
    language_id,
    quality_scores,
)
from etl_football_analytics_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_fingerprints_deterministic_and_aligned(spark, docs):
    """xxh64 must be stable under repartitioning, and md5/xxh64 must
    partition the corpus identically (same groups of identical docs)."""
    a = {r.doc_id: (r.md5_fingerprint, r.xxh64_fingerprint)
         for r in fingerprints(docs, "doc_id", "text").collect()}
    b = {r.doc_id: (r.md5_fingerprint, r.xxh64_fingerprint)
         for r in fingerprints(docs.repartition(7), "doc_id", "text").collect()}
    assert a == b
    md5_to_xxh = {}
    for md5, xxh in a.values():
        md5_to_xxh.setdefault(md5, set()).add(xxh)
    assert all(len(s) == 1 for s in md5_to_xxh.values())


def test_quality_scores_bounded(spark, docs):
    rows = quality_scores(docs, "doc_id", "text").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_words >= 0 and r.n_chars_measured >= 0


def test_language_id_covers_known_langs(spark, docs):
    preds = {r.predicted_lang for r in language_id(docs, "doc_id", "text").collect()}
    assert preds <= {"de", "en", "es", "fr", "und"}


def test_strip_common_lines(spark):
    from etl_football_analytics_pipeline_spark.operators.text import (
        strip_common_lines,
    )

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler}\nreal content one\nmore real text"),
            (2, f"{boiler}\nother content"),
            (3, f"{boiler}\nthird body\n{boiler}"),  # repeats within doc
            (4, boiler),                              # only boilerplate
            (5, "fully unique document"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.text_cleaned
        for r in strip_common_lines(docs, "doc_id", "text", max_df=2).collect()
    }
    assert out[1] == "real content one\nmore real text"
    assert out[2] == "other content"
    assert out[3] == "third body"
    assert out[4] == ""  # fully-boilerplate doc survives as empty
    assert out[5] == "fully unique document"
    # within-doc repeats count once: a line in only 2 DOCS stays even
    # if one doc repeats it 5 times
    docs2 = spark.createDataFrame(
        [(1, "x\nx\nx\nx\nx"), (2, "x\ny")], "doc_id int, text string"
    )
    out2 = {
        r.doc_id: r.text_cleaned
        for r in strip_common_lines(docs2, "doc_id", "text", max_df=2).collect()
    }
    assert out2[1] == "x\nx\nx\nx\nx" and out2[2] == "x\ny"


def test_strip_common_lines_plan_has_no_corpus_broadcast(spark):
    from etl_football_analytics_pipeline_spark.operators.text import (
        strip_common_lines,
    )

    docs = spark.createDataFrame([(1, "a\nb")], "doc_id int, text string")
    plan = (
        strip_common_lines(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
