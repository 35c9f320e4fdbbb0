"""Multimodal decode layer.

The container has no image/audio codecs, so ``decode_image`` is a
deterministic fake for ``media_type='fake/raw'`` and raises
``NotImplementedError`` for real formats — the Spark-side plumbing
(Arrow batches, schemas, partitioning) in
``terasort_spark/operators/multimodal.py`` is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

# Formats that genuinely need external codecs (PIL/ffmpeg).
UNSUPPORTED_FORMATS = ("image/jpeg", "image/png", "video/mp4")


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real decode of binary netpbm images — P5 (grayscale PGM) and P6
    (RGB PPM) — with a pure-python header parser; no external codec.
    Returns a float64 grayscale (H, W) array; RGB converts via the
    ITU-R BT.601 luma weights."""
    import re

    # Header: magic, whitespace/comment-separated width height maxval,
    # then ONE whitespace byte before the raster.
    m = re.match(
        rb"^(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)"
        rb"\s+(?:#[^\n]*\n\s*)*(\d+)[ \t\r\n]",
        payload,
    )
    if not m:
        raise ValueError("not a binary PPM/PGM (P5/P6) payload")
    magic, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    raster = payload[m.end() :]
    if magic == b"P5":
        n = w * h
        px = np.frombuffer(raster[:n], dtype=np.uint8).astype(np.float64)
        if px.size != n:
            raise ValueError("truncated PGM raster")
        return px.reshape(h, w)
    n = w * h * 3
    px = np.frombuffer(raster[:n], dtype=np.uint8).astype(np.float64)
    if px.size != n:
        raise ValueError("truncated PPM raster")
    rgb = px.reshape(h, w, 3)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def decode_image(payload: bytes, media_type: str) -> np.ndarray:
    """Decode an image payload to a float64 grayscale array.

    'image/ppm' / 'image/pgm' are REAL decodes (stdlib-only netpbm
    parser); 'fake/raw' is the deterministic test codec (4x4 thumbnail
    from the payload's sha256); compressed formats still raise where
    PIL/ffmpeg would slot in."""
    if media_type in ("image/ppm", "image/pgm"):
        return decode_ppm(payload)
    if media_type in UNSUPPORTED_FORMATS:
        raise NotImplementedError(
            f"no codec for {media_type} in this environment; "
            "install PIL/ffmpeg and replace this stub"
        )
    if media_type != "fake/raw":
        raise ValueError(f"unknown media_type {media_type!r}")
    # deterministic fake decode: 16 bytes of the blob's sha256 as pixels
    digest = hashlib.sha256(payload).digest()[:16]
    return np.frombuffer(digest, dtype=np.uint8).reshape(4, 4).astype(np.float64)


def extract_features_batched(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: vectorized per-batch feature extraction.
    Operates on whatever batch sizes Arrow hands over — never
    materializes the whole partition."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                # sha256 (not sha1): DuckDB has sha256 but no sha1, so
                # the oracle can recompute the same fingerprint in SQL
                "sha_8": payloads.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:8]
                ),
                "thumb_mean": payloads.combine(
                    pdf["media_type"],
                    lambda b, mt: float(decode_image(bytes(b), mt).mean()),
                ),
            }
        )


def resize_batched_arrow(batches):
    """mapInArrow worker: 2x2 mean-pool of the fake 4x4 thumbnail,
    operating on pyarrow RecordBatches directly — no pandas conversion,
    the path for high-volume binary columns where even the
    pandas-object overhead per blob matters."""
    import pyarrow as pa

    for batch in batches:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        pooled = []
        for b, mt in zip(payloads, types):
            img = decode_image(bytes(b), mt)
            # 4x4 -> 2x2 mean pool, row-major flatten
            p = img.reshape(2, 2, 2, 2).mean(axis=(1, 3))
            pooled.append([float(x) for x in p.ravel()])
        # flattened scalar columns (p00..p11), never a list column:
        # declared query outputs must stay hashable in pandas-based
        # canonicalizers (registry lint test_no_nested_output_types)
        cols = list(zip(*pooled)) if pooled else ([], [], [], [])
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id")]
            + [pa.array(list(c), pa.float64()) for c in cols],
            names=["doc_id", "p00", "p01", "p10", "p11"],
        )
