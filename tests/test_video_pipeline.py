"""Video modality (the last round-2 stub promoted to a real operator):
synthetic frame-concatenated table + codec invariants, frame sampling vs a
scalar recompute, and operator/golden-helper parity for the video_frames
gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators.video import (
    sample_video_frames,
    video_frame_stats,
    video_frame_stats_pandas,
)
from s2_geometry_library_java_spark.sources.video import (
    QUANT_STEP,
    caption_for,
    decode_frames,
    source_frames,
    synthetic_videos,
    videos_pandas,
)

EVERY_N = 4


@pytest.fixture(scope="module")
def videos(spark):
    return synthetic_videos(spark, 120, partitions=4).cache()


def test_videos_deterministic_and_schema(spark, videos):
    assert videos.count() == 120
    assert videos.columns == [
        "video_id", "bytes", "w", "h", "n_frames", "fps", "fmt", "caption",
    ]
    again = synthetic_videos(spark, 120, partitions=2)
    a = videos.select("video_id", "caption", F.md5("bytes").alias("b")).collect()
    b = again.select("video_id", "caption", F.md5("bytes").alias("b")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_video_frame_stats_invariants(videos):
    """Per-frame PSNR analog of the images rule: lossless frames decode
    exactly (999.0), lossy frames >= 40 dB; captions pass through."""
    stats = video_frame_stats(videos, every_n=EVERY_N).collect()
    meta = {r["video_id"]: r for r in videos.collect()}
    idx = np.arange(120, dtype=np.int64)
    captions = dict(zip([f"vid{i:010d}" for i in idx], caption_for(idx)))
    by_vid: dict = {}
    for r in stats:
        if r["fmt"] == "vraw":
            assert r["psnr"] == 999.0
        else:
            assert r["fmt"] == "vqnt" and r["psnr"] >= 40.0
        assert r["caption"] == captions[r["video_id"]]
        m = meta[r["video_id"]]
        assert r["frame_idx"] % EVERY_N == 0 and r["frame_idx"] < m["n_frames"]
        assert r["t_sec"] == pytest.approx(r["frame_idx"] / m["fps"], abs=0)
        by_vid.setdefault(r["video_id"], set()).add(r["frame_idx"])
    for vid, frames in by_vid.items():
        n = meta[vid]["n_frames"]
        assert frames == set(range(0, n, EVERY_N))


def test_sample_video_frames_bytes_match_truth(videos):
    """Sampled frame bytes equal the ground-truth frames (lossless) or
    their quantization (lossy) — and compose with image-shaped schema."""
    out = sample_video_frames(videos.limit(12), every_n=EVERY_N)
    assert out.columns == [
        "video_id", "frame_idx", "t_sec", "bytes", "w", "h", "fmt", "caption",
    ]
    meta = {r["video_id"]: r for r in videos.limit(12).collect()}
    for r in out.collect():
        i = int(r["video_id"][3:])
        m = meta[r["video_id"]]
        truth = source_frames(i, m["w"], m["h"], m["n_frames"])[r["frame_idx"]]
        if m["fmt"] == "vqnt":
            truth = (truth // QUANT_STEP) * QUANT_STEP
        got = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8)
        assert np.array_equal(got, truth)
        assert r["fmt"] == "raw" and r["w"] == m["w"] and r["h"] == m["h"]


def test_sampled_frames_compose_with_image_resize(videos):
    """The modality seam: sample_video_frames output IS image-table-shaped
    (bytes, w, h, fmt='raw'), so the image operators run on it unchanged —
    here nearest-neighbor resize, checked against a scalar recompute."""
    from s2_geometry_library_java_spark.operators.images import resize_images

    frames = sample_video_frames(videos.limit(8), every_n=EVERY_N)
    imgs = frames.select(
        F.concat_ws("#", "video_id", F.col("frame_idx").cast("string")).alias("image_id"),
        "bytes", "w", "h", "fmt", "caption",
    )
    out = resize_images(imgs, target=8).collect()
    meta = {r["video_id"]: r for r in videos.limit(8).collect()}
    n_expected = sum(len(range(0, m["n_frames"], EVERY_N)) for m in meta.values())
    assert len(out) == n_expected
    for r in out:
        vid, fidx = r["image_id"].split("#")
        m = meta[vid]
        truth = source_frames(int(vid[3:]), m["w"], m["h"], m["n_frames"])[int(fidx)]
        if m["fmt"] == "vqnt":
            truth = (truth // QUANT_STEP) * QUANT_STEP
        P = truth.reshape(m["h"], m["w"], 3)
        yi = np.arange(8) * m["h"] // 8
        xi = np.arange(8) * m["w"] // 8
        expect = P[yi][:, xi]
        got = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(got, expect)
        assert r["w"] == r["h"] == 8 and r["fmt"] == "raw"


def test_video_operator_matches_golden_helper(videos):
    got = (
        video_frame_stats(videos, every_n=EVERY_N)
        .toPandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    expect = (
        video_frame_stats_pandas(videos_pandas(0, 120), every_n=EVERY_N)
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expect)
    for c in ["mean_all", "psnr", "t_sec"]:
        assert np.array_equal(got[c].to_numpy(), expect[c].to_numpy()), c
    assert (got["frame_idx"].to_numpy() == expect["frame_idx"].to_numpy()).all()


def test_unknown_video_codec_gated():
    with pytest.raises(NotImplementedError):
        decode_frames(b"\x00", 1, 1, 1, "h264")


def test_short_video_decode_pads():
    """Truncated frame data pads with zeros (the codec seam) instead of
    raising from reshape."""
    f = decode_frames(b"\x01\x02", 2, 2, 3, "vraw")
    assert f.shape == (3, 12)
    assert f[0, 0] == 1 and f[0, 1] == 2 and int(f.sum()) == 3
