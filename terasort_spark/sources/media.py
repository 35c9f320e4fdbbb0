"""Multimodal decode layer.

REAL, dependency-free decoders: netpbm P5/P6 (``decode_ppm``) and PNG
(``decode_png`` — stdlib zlib inflate + full de-filtering), alongside
the deterministic ``fake/raw`` test codec. Only formats whose codecs
genuinely cannot be built from the stdlib (JPEG's DCT+Huffman, MP4)
raise ``NotImplementedError`` where PIL/ffmpeg would slot in. The
Spark-side plumbing (Arrow batches, schemas, partitioning) in
``terasort_spark/operators/multimodal.py`` is the same for all of them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

# Formats that genuinely need external codecs (PIL/ffmpeg). PNG is NOT
# here: its compression is stdlib zlib, so decode_png below is a real,
# dependency-free decoder. JPEG (DCT+Huffman) and MP4 (container+codec
# zoo) are the remaining genuine boundaries.
UNSUPPORTED_FORMATS = ("image/jpeg", "video/mp4")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode with no external codec: chunk walk, zlib
    inflate (stdlib), per-scanline de-filtering (None/Sub/Up/Average/
    Paeth), 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), no interlace. Returns float64 grayscale
    (H, W) via BT.601 luma, matching decode_ppm's contract."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace}: only 8-bit "
            "non-interlaced supported"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            row = bytearray((np.frombuffer(bytes(row), np.uint8) + prev).astype(np.uint8).tobytes())
        elif ftype == 3:  # Average
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else b if pb_ <= pc_ else c
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    px = out.reshape(h, w, channels).astype(np.float64)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = plte[out.reshape(h, w)].astype(np.float64)
        return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    if color == 0:
        return px[..., 0]
    if color == 4:  # gray + alpha: alpha ignored for luma
        return px[..., 0]
    # RGB / RGBA
    return px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114


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

    'image/ppm' / 'image/pgm' / 'image/png' are REAL decodes
    (stdlib-only netpbm parser; zlib-based PNG decoder); 'fake/raw' is
    the deterministic test codec (4x4 thumbnail from the payload's
    sha256); JPEG/MP4 still raise where PIL/ffmpeg would slot in."""
    if media_type in ("image/ppm", "image/pgm"):
        return decode_ppm(payload)
    if media_type == "image/png":
        return decode_png(payload)
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
