"""Multimodal (image/audio/video) column support.

Driver-mandated extension: at 100 TB a training-data pipeline carries
media as opaque `binary` columns with typed metadata structs, and runs
decode / feature-extraction / resize / frame-sampling as Arrow-batched
pandas kernels over `mapInPandas`. The decode libraries (Pillow,
ffmpeg, torchaudio, …) are NOT in this container, so the codec step is
STUBBED two ways — a deterministic fake codec for a synthetic media
format (so the full pipeline is executable and testable end-to-end)
and `NotImplementedError` for real formats — while everything
Spark-side (schema contracts, partitioning, UDF signatures, Arrow
batch shapes, O(matches) shuffles) is real.

Schema contracts:
- image:  (id long, content binary, meta struct<width int, height int,
           format string>)
- video:  (id long, content binary, meta struct<fps int, n_frames int,
           frame_bytes int, format string>)

The synthetic "SMF" (Synthetic Media Format) codec: a 16-byte header
`SMF0` + width/height/format fields, then row-major uint8 pixels.
Deterministic bytes derive from a seed id via a PORTABLE md5 block
generator (pixel k of seed s = byte k%16 of md5("{s}:{k//16}")), so
every test run sees identical media AND a SQL oracle can recompute
every pixel (DuckDB's `md5()` emits the same hex digest) — the same
portable-hash-family pattern the MinHash/SimHash oracles use.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..utils import spread

_MAGIC = b"SMF0"

IMAGE_SCHEMA = "id long, content binary, meta struct<width:int, height:int, format:string>"


# ---------------------------------------------------------------------------
# Synthetic codec (deterministic fake)
# ---------------------------------------------------------------------------


def portable_pixels(seed: int, n: int) -> np.ndarray:
    """`n` deterministic uint8 pixels for image `seed`: byte j of
    md5(f"{seed}:{block}") for block = k//16, j = k%16. Portable by
    construction — a SQL engine recomputes pixel k as the hex pair at
    substr(md5(seed || ':' || k//16), (k%16)*2+1, 2)."""
    blocks = (n + 15) // 16
    buf = b"".join(hashlib.md5(f"{seed}:{b}".encode()).digest() for b in range(blocks))
    return np.frombuffer(buf[:n], dtype=np.uint8)


def smf_encode(seed: int, width: int, height: int) -> bytes:
    """Encode a deterministic fake image: portable md5-derived uint8
    pixel grid (see portable_pixels — oracle-recomputable)."""
    pixels = portable_pixels(seed, width * height).reshape(height, width)
    header = _MAGIC + struct.pack("<iii", width, height, 1)
    return header + pixels.tobytes()


def smf_decode(blob: bytes) -> np.ndarray:
    """Decode SMF → (height, width) uint8 array. Real formats raise —
    the documented stub boundary (decode libs absent from container)."""
    if blob[:4] != _MAGIC:
        raise NotImplementedError(
            "real image codecs (jpeg/png/...) are not available in this "
            "container; only the SMF synthetic format decodes"
        )
    width, height, _ = struct.unpack("<iii", blob[4:16])
    return np.frombuffer(blob[16:], dtype=np.uint8).reshape(height, width)


def synthetic_images(
    spark: SparkSession,
    n: int = 100,
    width: int = 32,
    height: int = 24,
    partitions: int | None = None,
) -> DataFrame:
    """A deterministic media table (id, content, meta) — the test/demo
    stand-in for a real bronze media layer.

    Generated executor-side from `spark.range` (the driver never holds
    the blobs — the shape that scales to a real media corpus), with
    partition count proportional to n: over-splitting a tiny table
    multiplies python-worker launches in every downstream chained
    kernel stage, which costs far more than the kernels themselves.
    """
    if partitions is None:
        parallelism = spark.sparkContext.defaultParallelism
        partitions = max(1, min(parallelism, n // 8))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": [bytearray(smf_encode(int(i), width, height)) for i in pdf["id"]],
                    "meta": [(width, height, "smf")] * len(pdf),
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(encode, IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Kernels — real Spark plumbing over the stubbed codec
# ---------------------------------------------------------------------------


def image_stats(images: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Decode + per-image statistics (the feature-extraction shape):
    one Arrow batch in, one small row out per image — O(rows) shuffle
    of scalars, pixels never leave the executor."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"id": [], "n_pixels": [], "mean_px": [], "min_px": [], "max_px": []}
            for i, blob in zip(pdf["id"], pdf["content"]):
                px = smf_decode(bytes(blob))
                out["id"].append(i)
                out["n_pixels"].append(int(px.size))
                # exact int sum ÷ exact int count: one correctly-rounded
                # IEEE division, bit-identical in any engine (so the SQL
                # oracle's SUM/COUNT division matches without rounding)
                out["mean_px"].append(float(px.sum()) / px.size)
                out["min_px"].append(int(px.min()))
                out["max_px"].append(int(px.max()))
            yield pd.DataFrame(out)

    return spread(images, min_partitions).mapInPandas(
        stats, "id long, n_pixels long, mean_px double, min_px int, max_px int"
    )


def image_resize(
    images: DataFrame,
    out_width: int,
    out_height: int,
    min_partitions: int | None = None,
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to SMF with updated metadata
    — content transforms stay inside the executor batch; the schema
    contract (content + meta struct) is preserved for downstream ops."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, blobs, metas = [], [], []
            for i, blob in zip(pdf["id"], pdf["content"]):
                px = smf_decode(bytes(blob))
                h, w = px.shape
                ys = (np.arange(out_height) * h // out_height).astype(np.int64)
                xs = (np.arange(out_width) * w // out_width).astype(np.int64)
                resized = px[ys][:, xs]
                header = _MAGIC + struct.pack("<iii", out_width, out_height, 1)
                ids.append(i)
                blobs.append(bytearray(header + resized.tobytes()))
                metas.append((out_width, out_height, "smf"))
            yield pd.DataFrame({"id": ids, "content": blobs, "meta": metas})

    return spread(images, min_partitions).mapInPandas(resize, IMAGE_SCHEMA)


def image_histogram_features(
    images: DataFrame, n_bins: int = 16, min_partitions: int | None = None
) -> DataFrame:
    """Pixel-intensity histogram → `array<float>` embedding column —
    the bridge from media to the similarity/dedup operators (the
    embedding ops consume exactly this shape)."""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, n_bins + 1)
        for pdf in batches:
            if pdf.empty:
                continue
            ids, feats = [], []
            for i, blob in zip(pdf["id"], pdf["content"]):
                px = smf_decode(bytes(blob))
                counts, _ = np.histogram(px, bins=edges)
                # multiply by reciprocal: elementwise division is slow here
                feats.append((counts * (1.0 / px.size)).astype(np.float32))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "embedding": feats})

    return spread(images, min_partitions).mapInPandas(hist, "id long, embedding array<float>")


def image_feature_pipeline(
    images: DataFrame,
    out_width: int,
    out_height: int,
    n_bins: int = 16,
    min_partitions: int | None = None,
) -> DataFrame:
    """FUSED decode → resize → histogram-features kernel: one
    `mapInPandas` pass producing the same (id, embedding) frame as
    `image_histogram_features(image_resize(images, w, h))`, pinned
    equal in tests/test_multimodal.py.

    Why it exists: Catalyst fuses adjacent Column expressions into one
    codegen stage, but each `mapInPandas` is an opaque barrier — a
    chain of N python kernels ships the PIXELS through Arrow and a
    python worker N times. Media blobs are the widest column in the
    pipeline by orders of magnitude, so at 100 TB the dominant cost of
    a kernel chain is exactly those re-crossings. The fused form
    decodes each blob once and moves pixels zero times; only the
    n_bins-float embedding leaves the worker. Measured ~2× on the
    registered media near-dup query even at demo scale.

    The single-step operators (image_resize / image_histogram_features
    / image_stats) remain the composable surface; fuse when the chain
    is known ahead of time."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, n_bins + 1)
        for pdf in batches:
            if pdf.empty:
                continue
            ids, embs = [], []
            for i, blob in zip(pdf["id"], pdf["content"]):
                px = smf_decode(bytes(blob))
                h, w = px.shape
                ys = (np.arange(out_height) * h // out_height).astype(np.int64)
                xs = (np.arange(out_width) * w // out_width).astype(np.int64)
                resized = px[ys][:, xs]
                counts, _ = np.histogram(resized, bins=edges)
                embs.append((counts * (1.0 / resized.size)).astype(np.float32))
                ids.append(i)
            yield pd.DataFrame({"id": ids, "embedding": embs})

    return spread(images, min_partitions).mapInPandas(
        feats, "id long, embedding array<float>"
    )


def frame_sample(
    images: DataFrame,
    every_k: int = 4,
    frame_rows: int = 4,
    min_partitions: int | None = None,
) -> DataFrame:
    """Frame sampling over a video-like container: treat each SMF blob
    as a stack of `frame_rows`-row frames and emit every k-th frame as
    its own SMF image — the explode-shaped op (1 row in, n_frames/k
    out) that video pipelines fan out with."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, frame_ids, blobs, metas = [], [], [], []
            for i, blob in zip(pdf["id"], pdf["content"]):
                px = smf_decode(bytes(blob))
                h, w = px.shape
                n_frames = h // frame_rows
                for f in range(0, n_frames, every_k):
                    frame = px[f * frame_rows : (f + 1) * frame_rows]
                    header = _MAGIC + struct.pack("<iii", w, frame_rows, 1)
                    ids.append(i)
                    frame_ids.append(f)
                    blobs.append(bytearray(header + frame.tobytes()))
                    metas.append((w, frame_rows, "smf"))
            yield pd.DataFrame(
                {"id": ids, "frame_id": frame_ids, "content": blobs, "meta": metas}
            )

    return spread(images, min_partitions).mapInPandas(
        sample,
        "id long, frame_id int, content binary, meta struct<width:int, height:int, format:string>",
    )
