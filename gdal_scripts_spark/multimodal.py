"""Multimodal binary-column plumbing (driver prompt: image/audio/video as
opaque binary + typed metadata).

The Spark-side machinery — schema, Arrow batch shape, partition sizing, UDF
signatures — is real and tested; the codec boundary is explicit:
- formats this engine decodes natively (ppm/pgm/png/jpeg) run for real via
  gdal_scripts_spark.codecs;
- external-library formats (audio, video frames) are gated
  stubs: a deterministic fake when ``deterministic_fake=True`` (so the
  distributed plumbing is testable end-to-end), NotImplementedError
  otherwise. The container has no image/audio libs (SURVEY.md §0).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codecs

FEATURE_SCHEMA = (
    "image_id string, ok boolean, h int, w int, c int, mean_0 double, "
    "mean_1 double, mean_2 double, contrast double, phash long"
)


def _fake_decode(buf: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for an external codec: bytes -> pseudo-pixels
    (xxhash-free, reproducible). Clearly NOT a real decode."""
    a = np.frombuffer(buf, dtype=np.uint8)
    need = max(w * h * 3, 3)
    rep = np.resize(a, need)
    return rep.reshape(max(h, 1), max(w, 1), 3)


def decode_any(buf: bytes, fmt: str, w: int, h: int,
               deterministic_fake: bool = False) -> np.ndarray:
    fmt = fmt.lower()
    if fmt in ("ppm", "pgm", "pnm", "png", "jpeg", "jpg"):
        img = codecs.decode(buf, fmt)
        return img if img.ndim == 3 else img[:, :, None]
    if deterministic_fake:
        return _fake_decode(buf, w, h)
    raise NotImplementedError(
        f"codec for fmt={fmt!r} requires an external library absent from this "
        "container; pass deterministic_fake=True to exercise the plumbing"
    )


def extract_features(images: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Per-image feature row via one Arrow pass (mean/contrast/aHash).

    Bad/undecodable rows are quarantined (ok=false) instead of failing the
    job — the ops posture a 100 TB pipeline needs."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, byts, fmt, w_, h_ in zip(
                b["image_id"].values, b["bytes"].values, b["fmt"].values,
                b["w"].values, b["h"].values,
            ):
                try:
                    img = decode_any(bytes(byts), fmt, int(w_), int(h_),
                                     deterministic_fake)
                    means = img.astype(np.float64).mean(axis=(0, 1))
                    m = [float(means[i]) if i < img.shape[2] else float("nan")
                         for i in range(3)]
                    rows.append((iid, True, img.shape[0], img.shape[1],
                                 img.shape[2], m[0], m[1], m[2],
                                 float(img.astype(np.float64).std()),
                                 codecs.ahash64(img)))
                except Exception:
                    rows.append((iid, False, None, None, None,
                                 None, None, None, None, None))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["image_id", "ok", "h", "w", "c", "mean_0",
                                   "mean_1", "mean_2", "contrast", "phash"])

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16,
                  deterministic_fake: bool = False) -> DataFrame:
    """Nearest-neighbor thumbnail (real for native fmts) re-encoded as PNG."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, byts, fmt, w_, h_ in zip(
                b["image_id"].values, b["bytes"].values, b["fmt"].values,
                b["w"].values, b["h"].values,
            ):
                img = decode_any(bytes(byts), fmt, int(w_), int(h_),
                                 deterministic_fake)
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                thumb = img[np.ix_(ys, xs)]
                sq = thumb[:, :, 0] if thumb.shape[2] == 1 else thumb
                rows.append((iid, codecs.encode_png(sq), "png",
                             out_w, out_h))
            if rows:
                yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "w", "h"])

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, schema="image_id string, bytes binary, fmt string, w int, h int"
    )


def frame_sample_stub(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — plumbing-only stub (no video codec in
    container): schema + partition shape are the real design; the decode
    raises. (video_id, frame_idx, frame_bytes)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame decode requires an external codec library"
        )
        yield  # pragma: no cover

    return videos.mapInPandas(
        run, schema="video_id string, frame_idx int, frame_bytes binary"
    )
