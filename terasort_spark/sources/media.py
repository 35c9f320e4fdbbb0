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

REAL_FORMATS = ("image/jpeg", "image/png", "audio/wav", "video/mp4")


def decode_image(payload: bytes, media_type: str) -> np.ndarray:
    """Return a 4x4 grayscale 'thumbnail' for the fake format.

    Real codecs would go here (PIL/ffmpeg); they are intentionally
    stubbed — the engine's contract is the distributed plumbing, not the
    codec."""
    if media_type in REAL_FORMATS:
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
                "sha1_8": payloads.map(
                    lambda b: hashlib.sha1(bytes(b)).hexdigest()[:8]
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
