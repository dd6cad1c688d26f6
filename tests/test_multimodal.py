"""Multimodal binary-column operators: decode, stats, resize, features,
frame sampling, audio stats (all Arrow-batched mapInPandas)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    return MM.synthetic_media_from_docs(docs).cache()


def test_media_generation_deterministic(spark, media):
    docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    again = MM.synthetic_media_from_docs(docs.repartition(5))
    a = {r.media_id: (r.kind, bytes(r.content)) for r in media.collect()}
    b = {r.media_id: (r.kind, bytes(r.content)) for r in again.collect()}
    assert a == b  # content independent of partitioning


def test_kinds_round_robin(media):
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"
    assert len(kinds) == 12


def test_image_stats_matches_local_decode(media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    arr = MM.decode_bytes(bytes(row.content), row.meta.asDict())
    out = MM.image_stats(media).filter(F.col("media_id") == 0).collect()[0]
    assert (out.height, out.width, out.channels) == arr.shape
    assert out.mean_intensity == pytest.approx(arr.mean())
    assert out.std_intensity == pytest.approx(arr.std())
    assert (out.min_intensity, out.max_intensity) == (arr.min(), arr.max())


def test_resize_shape_and_content(media):
    resized = MM.resize_images(media, 16, 16)
    rows = resized.collect()
    assert {r.media_id for r in rows} == {0, 3, 6, 9}  # the image rows
    for r in rows:
        assert r.meta.width == 16 and r.meta.height == 16
        arr = MM.decode_bytes(bytes(r.content), r.meta.asDict())
        assert arr.shape == (16, 16, 3)
    # nearest-neighbor: resized pixel (0,0) is source pixel (0,0)
    src = media.filter(F.col("media_id") == 0).collect()[0]
    src_arr = MM.decode_bytes(bytes(src.content), src.meta.asDict())
    out_arr = MM.decode_bytes(
        bytes([r for r in rows if r.media_id == 0][0].content),
        [r for r in rows if r.media_id == 0][0].meta.asDict(),
    )
    assert (out_arr[0, 0] == src_arr[0, 0]).all()


def test_grid_features_shape_and_pooling(media):
    out = {r.media_id: r.embedding for r in MM.image_grid_features(media, grid=4).collect()}
    assert set(out) == {0, 3, 6, 9}
    assert all(len(v) == 4 * 4 * 3 for v in out.values())
    # embedding mean == overall image mean (pooling partitions the pixels)
    row = media.filter(F.col("media_id") == 0).collect()[0]
    arr = MM.decode_bytes(bytes(row.content), row.meta.asDict()).astype(float)
    h, w, _ = arr.shape
    # cell sizes differ, so weight cells by pixel count for the check
    yi = (np.arange(h) * 4 // h).clip(0, 3)
    xi = (np.arange(w) * 4 // w).clip(0, 3)
    expected = np.zeros((4, 4, 3))
    counts = np.zeros((4, 4, 1))
    np.add.at(expected, (yi[:, None], xi[None, :]), arr)
    np.add.at(counts, (yi[:, None], xi[None, :]), 1.0)
    assert np.allclose(out[0], (expected / counts).ravel(), atol=1e-4)


def test_frame_sampling(media):
    frames = MM.sample_frames(media, every_k=2).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    # videos are ids 2, 5, 8, 11 with 8 + id%5 frames
    assert set(by_vid) == {2, 5, 8, 11}
    for vid, idxs in by_vid.items():
        n = 8 + vid % 5
        assert sorted(idxs) == list(range(0, n, 2))
    # each sampled frame decodes as a 16x16x3 image identical to the
    # source video's frame
    src = {r.media_id: r for r in media.filter(F.col("kind") == "video").collect()}
    f0 = [r for r in frames if r.media_id == 2 and r.frame_idx == 2][0]
    vid_arr = MM.decode_bytes(bytes(src[2].content), src[2].meta.asDict())
    frame_arr = MM.decode_bytes(bytes(f0.content), f0.meta.asDict())
    assert (frame_arr == vid_arr[2]).all()


def test_audio_stats(media):
    out = {r.media_id: r for r in MM.audio_stats(media).collect()}
    assert set(out) == {1, 4, 7, 10}
    r = out[1]
    assert r.n_samples == 4000 + 1 % 1000
    assert r.duration_sec == pytest.approx(r.n_samples / 8000)
    assert r.rms > 0 and 0 < r.zero_crossing_rate < 1


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="PIL"):
        MM.decode_bytes(b"\xff\xd8\xff", {"format": "jpeg"})
