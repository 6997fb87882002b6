"""Multimodal (image) column operators: decode / verify / feature-extract /
resize over the opaque ``bytes`` column of the images fact table.

The Spark-side plumbing — binary columns with typed metadata, mapInPandas
Arrow batching, schema evolution — is real and tested; the codec itself is
the deterministic fake from sources/images.py (the container has no image
libraries; a deployment swaps ``decode_pixels`` for libjpeg/PIL inside the
same batch loop).  Unsupported codecs raise NotImplementedError, clearly
gated per the build brief.

PSNR invariant (BASELINE.json): decoded pixels vs the ground-truth source
must be exact for lossless rows and >= 40 dB for lossy rows; caption passes
through unchanged (equality-checked).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from s2_geometry_library_java_spark.sources.images import decode_pixels, source_pixels


def _row_index(image_id: str) -> int:
    return int(image_id[3:])


def image_stats(images: DataFrame) -> DataFrame:
    """Decode + per-image feature extraction (mean/std per channel) and PSNR
    vs the recomputable ground truth.  Infinite PSNR (lossless) -> 999.0."""
    schema = (
        "image_id string, w int, h int, fmt string, caption string, "
        "mean_r double, mean_g double, mean_b double, std_all double, psnr double"
    )

    def it(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                pix = decode_pixels(row.bytes, row.w, row.h, row.fmt).astype(np.float64)
                src = source_pixels(_row_index(row.image_id), row.w, row.h).astype(np.float64)
                mse = float(np.mean((pix - src) ** 2))
                psnr = 999.0 if mse == 0.0 else 10.0 * math.log10(255.0**2 / mse)
                rgb = pix.reshape(-1, 3)
                out.append(
                    (
                        row.image_id, row.w, row.h, row.fmt, row.caption,
                        float(rgb[:, 0].mean()), float(rgb[:, 1].mean()), float(rgb[:, 2].mean()),
                        float(pix.std()), psnr,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "w", "h", "fmt", "caption",
                    "mean_r", "mean_g", "mean_b", "std_all", "psnr",
                ],
            )

    return images.mapInPandas(it, schema)


def resize_images(images: DataFrame, target: int = 16) -> DataFrame:
    """Nearest-neighbor resize to target x target (pure NumPy; the Spark
    plumbing — binary in, binary out, new typed metadata — is the point)."""
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string"

    def it(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                pix = decode_pixels(row.bytes, row.w, row.h, row.fmt).reshape(row.h, row.w, 3)
                yi = (np.arange(target) * row.h // target).astype(np.int64)
                xi = (np.arange(target) * row.w // target).astype(np.int64)
                small = pix[yi][:, xi]
                rows.append((row.image_id, small.tobytes(), target, target, "raw", row.caption))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption"])

    return images.mapInPandas(it, schema)


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB: no video codec in this container."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav, not present in this container; "
        "the plumbing would mirror image_stats (mapInPandas over binary + frame index explode)"
    )
