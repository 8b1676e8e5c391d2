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


def test_assembly_end_to_end(spark):
    """Split → mixture sample → decontaminate → pack, deterministic
    under repartitioning, with a planted train/test leak dropped."""
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        assemble_training_set,
    )
    from etl_football_analytics_pipeline_spark.operators.corpus import (
        deterministic_split,
    )

    base = [
        (i, f"document number {i} talks about topic {i % 9} in some detail today", "web")
        for i in range(400)
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string, source string")
    # plant a LEAK: one test-fold doc gets a train-fold doc's exact text
    folds = {r["doc_id"]: r["split"] for r in deterministic_split(docs, "doc_id").collect()}
    train_ids = [i for i, s in folds.items() if s == "train"]
    test_ids = [i for i, s in folds.items() if s == "test"]
    leak_src, leak_dst = train_ids[0], test_ids[0]
    leaked_text = dict((i, t) for i, t, _ in base)[leak_src]
    docs = spark.createDataFrame(
        [(i, leaked_text if i == leak_dst else t, s) for i, t, s in base],
        "doc_id long, text string, source string",
    )

    out, stats = assemble_training_set(
        docs, seq_len=64, contamination_threshold=0.8, with_stats=True
    )
    assert stats.split_docs == {
        s: len([1 for v in folds.values() if v == s]) for s in ("train", "val", "test")
    }
    # the planted leak is flagged and dropped from the eval fold
    leaked_rows = {r["doc_id"]: r["containment"] for r in out["decontam"].collect()}
    assert leaked_rows[leak_dst] == 1.0
    assert out["test"].filter(F.col("doc_id") == leak_dst).count() == 0
    assert stats.contaminated_test_docs >= 1
    # packing covers exactly the train fold, sequences are dense 0..n-1
    packed_ids = {r["doc_id"] for r in out["train_packed"].collect()}
    assert packed_ids == {r["doc_id"] for r in out["train"].collect()}
    seq_ids = sorted({r["seq_id"] for r in out["train_packed"].collect()})
    assert seq_ids == list(range(stats.n_sequences))
    # deterministic under repartition
    out2 = assemble_training_set(docs.repartition(13), seq_len=64)
    a = sorted(map(tuple, out["train_packed"].collect()))
    b = sorted(map(tuple, out2["train_packed"].collect()))
    assert a == b


def test_assembly_mixture_thins_train_only(spark):
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        assemble_training_set,
    )

    docs = spark.createDataFrame(
        [(i, f"text about item {i} and its properties", "crawl" if i % 2 else "wiki")
         for i in range(600)],
        "doc_id long, text string, source string",
    )
    full = assemble_training_set(docs)
    mixed = assemble_training_set(docs, mixture={"crawl": 0.25}, default_fraction=1.0)
    n_full, n_mixed = full["train"].count(), mixed["train"].count()
    assert n_mixed < n_full
    # wiki untouched, crawl thinned to ~a quarter
    wiki_full = full["train"].filter(F.col("source") == "wiki").count()
    assert mixed["train"].filter(F.col("source") == "wiki").count() == wiki_full
    crawl_full = full["train"].filter(F.col("source") == "crawl").count()
    crawl_mixed = mixed["train"].filter(F.col("source") == "crawl").count()
    assert abs(crawl_mixed / crawl_full - 0.25) < 0.15
    # eval folds identical — mixing must never touch them
    assert full["val"].count() == mixed["val"].count()
    assert full["test"].count() == mixed["test"].count()


def test_streaming_curation_sink(spark, tmp_path):
    """True readStream micro-batches through curation_sink: quality
    junk dropped, cross-batch exact dups land once (lowest id wins),
    replaying the whole stream inserts nothing new, and the corpus
    table advances as atomic snapshots."""
    import os

    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import curation_sink
    from etl_football_analytics_pipeline_spark.sources.versioned import (
        current_version,
        read_latest,
    )

    src = str(tmp_path / "incoming")
    corpus_dir = str(tmp_path / "corpus")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    os.makedirs(src)
    good_a = "the quick brown fox jumps over the lazy dog and it is a fine day for that"
    good_b = "completely different text about spark engines and parquet files at scale here"
    # file 1: one good doc + junk; file 2: an exact dup of the good doc
    # (higher id) + a new doc — maxFilesPerTrigger=1 forces the dup to
    # arrive in a LATER micro-batch than the original. Plain one-file
    # parquet (pyarrow): the file stream source lists FILES, not the
    # directories DataFrame.write produces.
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [good_a, "!!! ??? ;;; :::"]},
                 schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())])),
        f"{src}/f1.parquet",
    )
    pq.write_table(
        pa.table({"doc_id": [10, 11], "text": [good_a, good_b]},
                 schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())])),
        f"{src}/f2.parquet",
    )
    # the file source orders batches by modification time; back-to-back
    # writes can tie at mtime granularity and flip the order under
    # load — pin strictly increasing mtimes so f1 is always batch 1
    import time as _time

    now = _time.time()
    os.utime(f"{src}/f1.parquet", (now - 10, now - 10))
    os.utime(f"{src}/f2.parquet", (now, now))

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(curation_sink(corpus_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run(ckpt1)
    rows = {r["doc_id"]: r["text"] for r in read_latest(spark, corpus_dir).collect()}
    # junk gone; dup of good_a kept once under its LOWEST id
    assert rows == {1: good_a, 11: good_b}
    v1 = current_version(corpus_dir)
    assert v1 is not None and v1 >= 1
    # full replay (fresh checkpoint): insert-if-absent adds nothing
    run(ckpt2)
    rows2 = {r["doc_id"]: r["text"] for r in read_latest(spark, corpus_dir).collect()}
    assert rows2 == rows


def test_curate_with_line_stripping(spark):
    """Shared boilerplate is removed before hashing, so two pages that
    differ only in chrome dedup down to one."""
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        curate_corpus,
    )

    chrome = "subscribe now for updates and offers today"
    body = "a genuinely long unique body with plenty of distinct words " * 4
    docs = spark.createDataFrame(
        [
            (1, f"{chrome}\n{body}"),
            (2, f"{chrome}\n{body}"),   # exact dup after stripping
            (3, f"{chrome}\n" + "some other sufficiently long unique body text " * 3),
        ],
        "doc_id int, text string",
    )
    out = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.9, strip_lines_max_df=2
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 3]
    assert all(chrome not in r.text for r in out.collect())


def test_curate_with_span_stripping(spark):
    """A long passage quoted across documents survives only in its
    first document after the substring-dedup stage; quoting documents
    keep their own text."""
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        curate_corpus,
    )

    quoted = " ".join(f"quote{i}" for i in range(15))
    own = lambda i: f"original analysis {i} with plenty of distinct words here " * 3  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, own(1) + " " + quoted),
            (2, own(2) + " " + quoted),
            (3, own(3)),
        ],
        "doc_id int, text string",
    )
    out = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.95, strip_span_min_tokens=10
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert "quote0" in rows[1]       # first copy kept
    assert "quote0" not in rows[2]   # later copy stripped
    assert "original analysis 2" in rows[2]


def test_curate_with_lm_gate(spark):
    """The perplexity gate drops the document whose bigrams the
    reference LM has never seen, keeps in-distribution ones."""
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        curate_corpus,
    )

    ref = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog again and again")
         for i in range(5)],
        "doc_id int, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zq wv xk jj qp mn zz vv kk pp qq ww"),
        ],
        "doc_id int, text string",
    )
    out = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.99,
        min_lm_logprob=-1.5, lm_reference=ref,  # OOV floor here is log(1/V) ≈ -2.48
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1]


def test_curate_with_classifier_gate(spark):
    """The supervised gate drops documents the trained hashed-BoW
    model scores as junk, keeps the clean ones."""
    from etl_football_analytics_pipeline_spark.operators.classifier import (
        quality_train,
    )
    from etl_football_analytics_pipeline_spark.pipeline.llm_corpus import (
        curate_corpus,
    )

    clean = "the quick brown fox jumps over a lazy dog near the river"
    junk = "buy cheap now click here winner free casino pills deal urgent"
    labeled = spark.createDataFrame(
        [(100 + i, clean, 1) for i in range(10)]
        + [(200 + i, junk, 0) for i in range(10)],
        "doc_id long, text string, label long",
    )
    w = quality_train(labeled, "text", "label", dim=256, iters=60)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps near a quiet river"),
            (2, "click here buy cheap pills winner casino deal"),
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.99,
        classifier_weights=w,
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1]
