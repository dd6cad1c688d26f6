"""Multimodal (image / audio / video) columns over Spark.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB training-data lake actually uses (parquet
with large binary pages; never one file per asset). All per-byte work runs
in Arrow-batched ``mapInPandas`` stages: the binary never passes through
row-at-a-time Python, and each stage's output schema is declared up front
so the plumbing (schema, partitioning, batch shape) is real even where a
codec is stubbed.

Codecs:

- RAW formats are implemented for real in numpy: ``raw-rgb8`` images are
  H*W*C uint8 buffers, ``raw-pcm16`` audio is little-endian int16 PCM,
  ``raw-v8`` video is N concatenated raw-rgb8 frames. Deterministic, no
  external libs, and genuinely exercised by decode / resize / feature /
  frame-sample below.
- Compressed formats (jpeg/png/wav/mp4) require PIL/libav, which are not
  in this container: ``decode_bytes`` raises ``NotImplementedError`` for
  them with the dependency named. The Spark-side pipeline is identical —
  only the per-buffer ``np.frombuffer`` call changes.

Scale notes: blobs make rows wide, so stages that carry ``content`` set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (see
``MEDIA_ARROW_BATCH``) to keep Arrow batches ~tens of MB; feature/stat
stages drop the binary column as early as possible (column pruning does
the rest); frame sampling explodes inside the same mapInPandas pass (no
shuffle between decode and sample).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from market_data_pipeline_spark.operators.util import ensure_parallelism

# Keep Arrow batches small when rows carry megabyte-scale blobs.
MEDIA_ARROW_BATCH = 64

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),       # raw-rgb8 | raw-pcm16 | raw-v8 | jpeg | ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_frames", T.IntegerType()),     # video
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),          # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_TYPE),
    ]
)

_RAW_FORMATS = {"raw-rgb8", "raw-pcm16", "raw-v8"}


def decode_bytes(content: bytes, meta: dict[str, Any]) -> np.ndarray:
    """Decode one media buffer to a numpy array.

    raw-rgb8 -> (H, W, C) uint8; raw-pcm16 -> (n_samples,) int16;
    raw-v8 -> (N, H, W, C) uint8. Compressed formats need external codec
    libraries that are not installed here and raise ``NotImplementedError``
    — swap this one function to enable them; every operator below is
    format-agnostic.
    """
    fmt = meta["format"]
    if fmt == "raw-rgb8":
        h, w, c = meta["height"], meta["width"], meta["channels"]
        return np.frombuffer(content, dtype=np.uint8, count=h * w * c).reshape(h, w, c)
    if fmt == "raw-pcm16":
        return np.frombuffer(content, dtype="<i2")
    if fmt == "raw-v8":
        n, h, w, c = meta["n_frames"], meta["height"], meta["width"], meta["channels"]
        return np.frombuffer(content, dtype=np.uint8, count=n * h * w * c).reshape(n, h, w, c)
    raise NotImplementedError(
        f"codec for format {fmt!r} requires an external library "
        "(PIL/imageio for images, soundfile for audio, pyav for video) "
        "which is not available in this environment; only raw formats "
        f"{sorted(_RAW_FORMATS)} are decodable here"
    )


def synthetic_media_from_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic media table derived from the documents
    table: one image / audio / video row per doc (round-robin by id), with
    content generated from a per-id seeded PCG64 — reproducible across
    runs and partitionings, generated fully distributed (no driver data).
    """
    out_schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col].astype("int64"):
                rng = np.random.Generator(np.random.PCG64(int(did)))
                kind = ("image", "audio", "video")[int(did) % 3]
                if kind == "image":
                    h, w, c = 24 + int(did) % 16, 32 + int(did) % 16, 3
                    buf = rng.integers(0, 256, size=h * w * c, dtype=np.uint8).tobytes()
                    meta = {"format": "raw-rgb8", "width": w, "height": h, "channels": c, "sample_rate": None, "n_frames": None}
                elif kind == "audio":
                    sr, n = 8000, 4000 + int(did) % 1000
                    buf = rng.integers(-(1 << 14), 1 << 14, size=n, dtype=np.int16)
                    buf = buf.astype("<i2").tobytes()
                    meta = {"format": "raw-pcm16", "width": None, "height": None, "channels": None, "sample_rate": sr, "n_frames": None}
                else:
                    nf, h, w, c = 8 + int(did) % 5, 16, 16, 3
                    buf = rng.integers(0, 256, size=nf * h * w * c, dtype=np.uint8).tobytes()
                    meta = {"format": "raw-v8", "width": w, "height": h, "channels": c, "sample_rate": None, "n_frames": nf}
                rows.append((int(did), kind, buf, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    src = ensure_parallelism(docs.select(id_col), id_col)
    return src.mapInPandas(gen, schema=out_schema)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("min_intensity", T.IntegerType()),
        T.StructField("max_intensity", T.IntegerType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode images and emit per-image pixel statistics.

    One mapInPandas pass; the binary column is consumed inside the stage
    and never shuffled onward. Input filter (kind='image') is a catalyst
    filter pushed to the scan.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_bytes(r["content"], r["meta"])
                rows.append(
                    (
                        int(r["media_id"]),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        int(arr.shape[2]),
                        float(arr.mean()),
                        float(arr.std()),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    src = media.filter(F.col("kind") == "image").select("media_id", "content", "meta")
    return src.mapInPandas(stats, schema=IMAGE_STATS_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of every image to (target_w, target_h),
    re-encoded as raw-rgb8 with updated metadata.

    Pure-numpy index-gather resize — a real transformation, not a stub.
    Output schema equals MEDIA_SCHEMA so resized media feeds any
    downstream media operator unchanged.
    """

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_bytes(r["content"], r["meta"])
                h, w, c = arr.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out = arr[yi][:, xi]
                rows.append(
                    (
                        int(r["media_id"]),
                        "image",
                        out.tobytes(),
                        {"format": "raw-rgb8", "width": target_w, "height": target_h, "channels": c, "sample_rate": None, "n_frames": None},
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    src = media.filter(F.col("kind") == "image").select("media_id", "content", "meta")
    return src.mapInPandas(rs, schema=MEDIA_SCHEMA)


def image_grid_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Grid-pooled mean-intensity embedding per image:
    (media_id, embedding: array<float> of length grid*grid*channels).

    The media analogue of a CNN feature extractor — downstream it plugs
    straight into the similarity operators (knn_*, cosine_near_dup_*),
    which is exactly the image-dedup path of a training-data pipeline.
    """
    emb_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_bytes(r["content"], r["meta"]).astype(np.float64)
                h, w, c = arr.shape
                yi = (np.arange(h) * grid // h).clip(0, grid - 1)
                xi = (np.arange(w) * grid // w).clip(0, grid - 1)
                pooled = np.zeros((grid, grid, c))
                counts = np.zeros((grid, grid, 1))
                np.add.at(pooled, (yi[:, None], xi[None, :]), arr)
                np.add.at(counts, (yi[:, None], xi[None, :]), 1.0)
                emb = (pooled / counts).ravel().astype(np.float32)
                rows.append((int(r["media_id"]), emb.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    src = media.filter(F.col("kind") == "image").select("media_id", "content", "meta")
    return src.mapInPandas(feats, schema=emb_schema)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of each video as a standalone raw-rgb8 image
    row: (media_id, frame_idx, kind='image', content, meta).

    The explode happens inside the decode stage — one pass, no
    decode-then-shuffle-then-sample round trip.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("kind", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
        ]
    )

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vid = decode_bytes(r["content"], r["meta"])
                n, h, w, c = vid.shape
                for i in range(0, n, every_k):
                    rows.append(
                        (
                            int(r["media_id"]),
                            i,
                            "image",
                            vid[i].tobytes(),
                            {"format": "raw-rgb8", "width": w, "height": h, "channels": c, "sample_rate": None, "n_frames": None},
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "kind", "content", "meta"]
            )

    src = media.filter(F.col("kind") == "video").select("media_id", "content", "meta")
    return src.mapInPandas(sf, schema=out_schema)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode PCM audio and emit duration / RMS / zero-crossing-rate — the
    standard cheap audio-quality filters of a speech-data pipeline."""

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pcm = decode_bytes(r["content"], r["meta"]).astype(np.float64)
                sr = r["meta"]["sample_rate"]
                zc = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if len(pcm) > 1 else 0.0
                rows.append(
                    (
                        int(r["media_id"]),
                        int(len(pcm)),
                        float(len(pcm) / sr),
                        float(np.sqrt(np.mean(pcm**2))),
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields])

    src = media.filter(F.col("kind") == "audio").select("media_id", "content", "meta")
    return src.mapInPandas(st, schema=AUDIO_STATS_SCHEMA)


def perceptual_hash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image: grid-pool
    the grayscale image to ``grid`` x ``grid`` mean intensities, set one
    bit per cell above the image's own mean — near-identical images
    (resizes, small edits, recompressions) land within a few Hamming
    bits, which is what makes image near-dup a HASH problem instead of
    an embedding problem.

    One Arrow pass image -> 64-bit hash (for the default grid=8); the
    binary never leaves the stage. Downstream pairs via exact groupBy on
    the hash (byte-identical dups) or banded Hamming join — the same
    bucketing machinery text SimHash uses (operators.dedup.simhash's
    band pattern applies unchanged to this hash).
    Returns (media_id, phash long).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("phash", T.LongType()),
        ]
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_bytes(r["content"], r["meta"]).astype(np.float64)
                # decode may yield 2-D grayscale; only channel-mean 3-D
                gray = arr if arr.ndim == 2 else arr.mean(axis=2)
                h, w = gray.shape
                # clamp the effective grid so every cell holds >=1 pixel:
                # an image dimension smaller than the grid would leave
                # zero-count cells -> NaN means -> a degenerate hash
                g = max(1, min(grid, h, w))
                yi = (np.arange(h) * g // h).clip(0, g - 1)
                xi = (np.arange(w) * g // w).clip(0, g - 1)
                pooled = np.zeros((g, g))
                counts = np.zeros((g, g))
                np.add.at(pooled, (yi[:, None], xi[None, :]), gray)
                np.add.at(counts, (yi[:, None], xi[None, :]), 1.0)
                cells = (pooled / counts).ravel()
                bits = cells > cells.mean()
                val = 0
                for b in bits:  # grid*grid iterations per image, in-batch
                    val = (val << 1) | int(b)
                # interpret as signed 64-bit so it fits LongType
                if val >= 1 << 63:
                    val -= 1 << 64
                rows.append((int(r["media_id"]), val))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    src = media.filter(F.col("kind") == "image").select("media_id", "content", "meta")
    return src.mapInPandas(hashes, schema=out_schema)


SCENE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_frame_diff", T.DoubleType()),
        T.StructField("max_frame_diff", T.DoubleType()),
        T.StructField("n_cuts", T.IntegerType()),
    ]
)


def scene_change_stats(media: DataFrame, cut_factor: float = 1.25) -> DataFrame:
    """Shot-boundary statistics per video: mean/max of the mean-absolute
    pixel difference between consecutive frames, plus the count of
    "cuts" (frames whose diff exceeds ``cut_factor`` x the video's own
    mean diff) — the cheap scene-change detector every video-curation
    pipeline runs before sampling frames for training.

    One Arrow pass per video inside ``mapInPandas``: the frames never
    leave the decode stage (same discipline as :func:`sample_frames`),
    the emitted row is a handful of scalars per video. Deterministic
    for a given byte payload.
    """

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vid = decode_bytes(r["content"], r["meta"]).astype(np.float64)
                n = vid.shape[0]
                if n < 2:
                    rows.append((int(r["media_id"]), int(n), None, None, 0))
                    continue
                diffs = np.abs(np.diff(vid, axis=0)).mean(axis=(1, 2, 3))
                mean_d = float(diffs.mean())
                rows.append(
                    (
                        int(r["media_id"]),
                        int(n),
                        mean_d,
                        float(diffs.max()),
                        int((diffs > cut_factor * mean_d).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_STATS_SCHEMA.fields]
            )

    src = media.filter(F.col("kind") == "video").select("media_id", "content", "meta")
    return src.mapInPandas(st, schema=SCENE_STATS_SCHEMA)
