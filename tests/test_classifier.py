"""Supervised quality classifier (operators.classifier): the hashed
bag-of-words logistic gate — separability on synthetic labels,
bit-deterministic training for a fixed layout, map-only scoring, and
the keep/drop gate form."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.classifier import (
    hashed_bow,
    quality_gate,
    quality_score,
    quality_train,
)

CLEAN = "the quick brown fox jumps over a lazy dog near the quiet river bank".split()
JUNK = "buy cheap now click here winner free casino pills xxx deal urgent".split()


def _labeled(spark, n=120, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = CLEAN if good else JUNK
        words = rng.choice(vocab, size=20)
        rows.append((i, " ".join(words), 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label long")


def test_classifier_separates_synthetic_labels(spark):
    df = _labeled(spark).cache()
    train = df.filter(F.col("doc_id") % 3 != 0)
    held = df.filter(F.col("doc_id") % 3 == 0)
    w = quality_train(train, "text", "label", dim=256, iters=80)
    scored = quality_score(held, w, "doc_id", "text").join(
        held.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    acc = sum(1 for r in rows if (r.quality_prob >= 0.5) == (r.label == 1)) / len(rows)
    assert acc >= 0.95


def test_training_is_deterministic_for_fixed_layout(spark):
    df = _labeled(spark, n=60)
    w1 = quality_train(df, "text", "label", dim=128, iters=15)
    w2 = quality_train(df, "text", "label", dim=128, iters=15)
    assert np.array_equal(w1, w2)


def test_hashed_bow_shape_and_norm(spark):
    df = _labeled(spark, n=10)
    rows = hashed_bow(df, "doc_id", "text", dim=64).collect()
    assert len(rows) == 10
    for r in rows:
        v = np.asarray(r.features)
        assert v.shape == (65,)
        assert v[-1] == 1.0  # bias slot
        # L1-normalized token histogram
        assert abs(v[:-1].sum() - 1.0) < 1e-9


def test_quality_gate_keeps_high_scoring_docs(spark):
    df = _labeled(spark).cache()
    w = quality_train(df, "text", "label", dim=256, iters=80)
    kept = quality_gate(df, w, "doc_id", "text", threshold=0.5)
    got = {r.doc_id for r in kept.collect()}
    want = {r.doc_id for r in df.filter("label = 1").collect()}
    # the gate keeps essentially the clean half
    sym = len(got ^ want) / len(want)
    assert sym <= 0.05
    # gate output keeps the full document row + the score column
    assert set(kept.columns) >= {"doc_id", "text", "label", "quality_prob"}


def test_bounded_driver_collect_at_high_partition_count(spark):
    """The executor-side merge bounds driver state structurally: the
    per-iteration collect is grouped on ``bkey % merge_fanin``, so at
    most `merge_fanin` rows ever reach the driver no matter how many
    partitions/batches the corpus has. With a 48-partition input and
    fanin=4 training must still be bit-deterministic run-to-run, and
    the model must stay equivalent (the merge only re-associates the
    same gradient sum)."""
    df = _labeled(spark, n=120).repartition(48)
    w1 = quality_train(df, "text", "label", dim=128, iters=15, merge_fanin=4)
    w2 = quality_train(df, "text", "label", dim=128, iters=15, merge_fanin=4)
    assert np.array_equal(w1, w2)
    # re-association noise only — same model to float tolerance
    w_wide = quality_train(df, "text", "label", dim=128, iters=15, merge_fanin=64)
    np.testing.assert_allclose(w1, w_wide, rtol=1e-9, atol=1e-12)
    # and the degenerate fanin=1 bound (ONE row collected per iter)
    w_one = quality_train(df, "text", "label", dim=128, iters=15, merge_fanin=1)
    np.testing.assert_allclose(w1, w_one, rtol=1e-9, atol=1e-12)


def test_scoring_stable_under_repartitioning(spark):
    df = _labeled(spark, n=60)
    w = quality_train(df, "text", "label", dim=128, iters=30)
    a = {r.doc_id: r.quality_prob for r in quality_score(df, w, "doc_id", "text").collect()}
    b = {
        r.doc_id: r.quality_prob
        for r in quality_score(df.repartition(7), w, "doc_id", "text").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
