"""Multimodal (video) column operators — the last modality stub made real
(round 2 shipped ``sample_video_frames`` as NotImplementedError; the fake
codec in sources/video.py now makes the plumbing drivable end to end).

Two operators over the opaque frame-concatenated ``bytes`` column:

- ``sample_video_frames``: every-Nth-frame sampling — the frame-index
  explode a training-data pipeline runs before feeding frames to an image
  model.  One mapInPandas pass; each output row carries the frame's own
  bytes plus (video_id, frame_idx, t_sec) lineage.
- ``video_frame_stats``: decode + per-sampled-frame features (mean, PSNR
  vs recomputable ground truth) without materializing frame bytes — the
  verification path (per-frame PSNR >= 40 dB for lossy rows, exact for
  lossless), gated against a flat golden recompute through the SAME batch
  helper.

Within each Arrow batch, rows group by (w, h, n_frames, fmt) and process
as (rows, frames, pixels) uint8/int16 arrays in row chunks — whole-matrix
NumPy, the only per-row Python being the ``np.frombuffer`` view (inherent
to variable-length binary, same as images).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from s2_geometry_library_java_spark.sources.video import (
    _FRAME_MULT,
    _PIX_STEP,
    _VID_MULT,
    decode_frames,
)

_GROUP_CHUNK = 16

STATS_COLUMNS = [
    "video_id", "frame_idx", "t_sec", "w", "h", "fmt", "caption", "mean_all", "psnr",
]


def _truth_residues(ids: np.ndarray, n_frames: int, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(i*VM + f*FM + j*S) % 251 decomposed into per-row, per-frame, and
    per-pixel residue vectors (the image operator's trick, one axis more)."""
    row = ((ids.astype(np.uint64) * _VID_MULT) % np.uint64(251)).astype(np.int16)
    frame = ((np.arange(n_frames, dtype=np.uint64) * _FRAME_MULT) % np.uint64(251)).astype(np.int16)
    pix = ((np.arange(k, dtype=np.uint64) * _PIX_STEP) % np.uint64(251)).astype(np.int16)
    return row, frame, pix


def video_frame_stats_pandas(pdf: pd.DataFrame, every_n: int) -> pd.DataFrame:
    """Per-sampled-frame decode + stats for one pandas batch (shared by the
    Spark operator and the driver-side golden oracle)."""
    pdf = pdf.reset_index(drop=True)
    row_ids = pdf["video_id"].str.slice(3).astype(np.int64).to_numpy()
    byts = pdf["bytes"].to_numpy()
    out: list[pd.DataFrame] = []
    for (w, h, nf, fmt), grp in pdf.groupby(["w", "h", "n_frames", "fmt"], sort=False):
        w, h, nf, fmt = int(w), int(h), int(nf), str(fmt)
        k = w * h * 3
        sample = np.arange(0, nf, every_n)
        ns = len(sample)
        idx = grp.index.to_numpy()
        row_res, frame_res, pix_res = _truth_residues(row_ids[idx], nf, k)
        frame_sel = frame_res[sample]
        for c0 in range(0, len(idx), _GROUP_CHUNK):
            sel = idx[c0 : c0 + _GROUP_CHUNK]
            m = len(sel)
            F3 = np.stack(
                [decode_frames(byts[i], w, h, nf, fmt)[sample] for i in sel]
            )  # (m, ns, k) uint8
            sums = F3.sum(axis=2, dtype=np.int64)  # exact channel-sum per frame
            mean_all = sums / float(k)
            # truth T[r, f, j] = ((row + frame + pix) mod 251), all int16
            T = (
                row_res[c0 : c0 + m, None, None]
                + frame_sel[None, :, None]
                + pix_res[None, None, :]
            )
            T -= (T >= 251) * np.int16(251)
            T -= (T >= 251) * np.int16(251)
            d = F3.astype(np.int16) - T
            d32 = d.astype(np.int32)
            np.multiply(d32, d32, out=d32)
            mse = d32.sum(axis=2, dtype=np.int64) / float(k)
            psnr = np.where(
                mse == 0.0, 999.0, 10.0 * np.log10(255.0**2 / np.maximum(mse, 1e-300))
            )
            fps = pdf["fps"].to_numpy()[sel].astype(np.float64)
            out.append(
                pd.DataFrame(
                    {
                        "video_id": np.repeat(pdf["video_id"].to_numpy()[sel], ns),
                        "frame_idx": np.tile(sample.astype(np.int32), m),
                        # frame/fps directly (not (1/fps)*frame): bit-equal
                        # to the scalar definition of the timestamp
                        "t_sec": np.tile(sample.astype(np.float64), m) / np.repeat(fps, ns),
                        "w": np.int32(w),
                        "h": np.int32(h),
                        "fmt": fmt,
                        "caption": np.repeat(pdf["caption"].to_numpy()[sel], ns),
                        "mean_all": mean_all.reshape(-1),
                        "psnr": psnr.reshape(-1),
                    }
                )
            )
    if not out:
        return pd.DataFrame({c: [] for c in STATS_COLUMNS})
    return pd.concat(out, ignore_index=True)


def video_frame_stats(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Decode + per-sampled-frame verification features (mean, PSNR vs the
    recomputable ground truth; lossless frames pin psnr=999.0).  Same scale
    posture as image_stats/audio_stats: no repartition, Arrow byte-capped
    batches bound worker memory for wide binary rows."""
    schema = (
        "video_id string, frame_idx int, t_sec double, w int, h int, "
        "fmt string, caption string, mean_all double, psnr double"
    )

    def it(batches):
        for pdf in batches:
            if len(pdf):
                yield video_frame_stats_pandas(pdf, every_n)

    return videos.mapInPandas(it, schema)


def sample_video_frames(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Every-Nth-frame sampling: one row per sampled frame with the frame's
    own bytes — the fan-out a video corpus runs before image-model feature
    extraction.  Output schema matches the images table shape (bytes, w, h,
    fmt 'raw') so downstream image operators compose directly."""
    schema = (
        "video_id string, frame_idx int, t_sec double, bytes binary, "
        "w int, h int, fmt string, caption string"
    )

    def it(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            byts = pdf["bytes"].to_numpy()
            for (w, h, nf, fmt), grp in pdf.groupby(["w", "h", "n_frames", "fmt"], sort=False):
                w, h, nf, fmt = int(w), int(h), int(nf), str(fmt)
                sample = np.arange(0, nf, every_n)
                ns = len(sample)
                idx = grp.index.to_numpy()
                for c0 in range(0, len(idx), _GROUP_CHUNK):
                    sel = idx[c0 : c0 + _GROUP_CHUNK]
                    frames = [decode_frames(byts[i], w, h, nf, fmt)[sample] for i in sel]
                    fps = pdf["fps"].to_numpy()[sel].astype(np.float64)
                    yield pd.DataFrame(
                        {
                            "video_id": np.repeat(pdf["video_id"].to_numpy()[sel], ns),
                            "frame_idx": np.tile(sample.astype(np.int32), len(sel)),
                            "t_sec": np.tile(sample.astype(np.float64), len(sel))
                            / np.repeat(fps, ns),
                            "bytes": [f.tobytes() for fr in frames for f in fr],
                            "w": np.int32(w),
                            "h": np.int32(h),
                            "fmt": "raw",
                            "caption": np.repeat(pdf["caption"].to_numpy()[sel], ns),
                        }
                    )

    return videos.mapInPandas(it, schema)
