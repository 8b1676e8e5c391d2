"""Multimodal plumbing tests: codec roundtrip, kernel exactness vs
direct numpy, fan-out shapes, stub boundary, and the media→embedding
bridge into the similarity operators."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_football_analytics_pipeline_spark.operators.multimodal import (
    frame_sample,
    image_feature_pipeline,
    image_histogram_features,
    image_resize,
    image_stats,
    smf_decode,
    smf_encode,
    synthetic_images,
)
from etl_football_analytics_pipeline_spark.operators.similarity import all_pairs_cosine


def test_codec_roundtrip():
    blob = smf_encode(seed=7, width=5, height=3)
    px = smf_decode(blob)
    assert px.shape == (3, 5)
    # deterministic: same seed, same pixels
    assert np.array_equal(px, smf_decode(smf_encode(7, 5, 3)))


def test_real_formats_raise():
    with pytest.raises(NotImplementedError):
        smf_decode(b"\x89PNG\r\n\x1a\n....")


def test_image_stats_match_direct_decode(spark):
    imgs = synthetic_images(spark, n=20, width=8, height=6)
    got = {r.id: r for r in image_stats(imgs).collect()}
    assert len(got) == 20
    for i in range(20):
        px = smf_decode(smf_encode(i, 8, 6))
        assert got[i].n_pixels == px.size
        assert got[i].min_px == int(px.min())
        assert got[i].max_px == int(px.max())
        assert got[i].mean_px == pytest.approx(round(float(px.mean()), 4), abs=1e-4)


def test_resize_dims_and_schema(spark):
    imgs = synthetic_images(spark, n=5, width=32, height=24)
    out = image_resize(imgs, 8, 6)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.meta.width == 8 and r.meta.height == 6
        assert smf_decode(bytes(r.content)).shape == (6, 8)


def test_frame_sample_fanout(spark):
    # 32 rows / 4 rows-per-frame = 8 frames; every 4th -> frames 0 and 4
    imgs = synthetic_images(spark, n=3, width=16, height=32)
    out = frame_sample(imgs, every_k=4, frame_rows=4).collect()
    per_img = {}
    for r in out:
        per_img.setdefault(r.id, []).append(r.frame_id)
    assert all(sorted(v) == [0, 4] for v in per_img.values())
    # frame content = the right slice of the source image
    first = next(r for r in out if r.id == 0 and r.frame_id == 4)
    src = smf_decode(smf_encode(0, 16, 32))
    assert np.array_equal(smf_decode(bytes(first.content)), src[16:20])


def test_media_embedding_bridge_pairs_identical_images(spark):
    """Two ids encoding the same seed are pixel-identical; after the
    resize → histogram → cosine pipeline they must pair at 1.0."""
    a = synthetic_images(spark, n=10)
    dup = a.filter(F.col("id") < 3).withColumn("id", F.col("id") + 100)
    # id 100+k has the same content as id k (same seed bytes)
    imgs = a.unionByName(dup)
    feats = image_histogram_features(image_resize(imgs, 16, 12))
    pairs = all_pairs_cosine(feats, "id", "embedding", threshold=0.999).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert {(0, 100), (1, 101), (2, 102)} <= found


def test_fused_feature_pipeline_equals_composition(spark):
    """image_feature_pipeline must be bit-identical to the
    resize -> histogram composition it fuses (same numpy math, one
    Arrow crossing instead of three)."""
    imgs = synthetic_images(spark, n=12, width=32, height=24)
    fused = {r.id: r.embedding for r in image_feature_pipeline(imgs, 16, 12).collect()}
    composed = {
        r.id: r.embedding
        for r in image_histogram_features(image_resize(imgs, 16, 12)).collect()
    }
    assert fused.keys() == composed.keys()
    for k in fused:
        assert fused[k] == composed[k]


def test_portable_pixels_duckdb_parity():
    """The SMF pixel generator is oracle-recomputable BY CONSTRUCTION:
    DuckDB's md5() + hex-pair extraction must reproduce every pixel
    hashlib emits — the guard behind the mm_* value oracles."""
    import duckdb

    from etl_football_analytics_pipeline_spark.operators.multimodal import portable_pixels

    want = {s: portable_pixels(s, 50) for s in (0, 7, 100003)}
    got = duckdb.sql(
        """
        WITH imgs AS (SELECT unnest([0, 7, 100003]) AS s),
        ks AS (SELECT unnest(generate_series(0, 49)) AS k),
        px AS (
          SELECT i.s, ks.k,
                 (strpos('0123456789abcdef',
                         substr(md5(i.s || ':' || (ks.k // 16)), (ks.k % 16) * 2 + 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(md5(i.s || ':' || (ks.k // 16)), (ks.k % 16) * 2 + 2, 1)) - 1 AS val
          FROM imgs i CROSS JOIN ks
        )
        SELECT s, list(val ORDER BY k) AS vals FROM px GROUP BY s
        """
    ).fetchall()
    for s, vals in got:
        assert vals == list(want[s]), f"seed {s} mismatch"
