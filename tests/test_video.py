"""Real video-path tests: an in-test AVI muxer wrapping real JPEG
frames (from test_jpeg's encoder) exercises demux + frame-sample +
decode end-to-end; an in-test MP4 box builder exercises the metadata
probe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tests.test_jpeg import _encode_jpeg
from terasort_spark.sources.video import (
    decode_mp4_frames,
    iter_avi_mjpeg_frames,
    probe_mp4,
    sample_avi_frames,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _encode_avi_mjpeg(frames: list[bytes]) -> bytes:
    movi = b"".join(_chunk(b"00dc", f) for f in frames)
    hdrl = _list(b"hdrl", _chunk(b"avih", b"\x00" * 56))
    body = b"AVI " + hdrl + _list(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frame_sampling_end_to_end():
    """Six real JPEG frames muxed into an AVI; sampling every 2nd frame
    must demux + JPEG-decode back to the source pixels (flat-quant
    tolerance), including an odd-sized frame that forces RIFF padding."""
    rng = np.random.RandomState(17)
    sources = [
        rng.randint(0, 256, size=(16, 16)).astype(np.float64) for _ in range(6)
    ]
    payload = _encode_avi_mjpeg([_encode_jpeg(s) for s in sources])
    assert len(iter_avi_mjpeg_frames(payload)) == 6
    sampled = sample_avi_frames(payload, every=2)
    assert [i for i, _ in sampled] == [0, 2, 4]
    for i, luma in sampled:
        assert np.max(np.abs(luma - sources[i])) < 5.0


def test_mp4_probe_reads_duration_and_geometry():
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = bytes([0]) + b"\x00" * 11 + struct.pack(">II", 1000, 90_500)
    mvhd += b"\x00" * 80
    tkhd = bytes([0]) + b"\x00" * 79 + struct.pack(">II", 640 << 16, 360 << 16)
    moov = box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd))
    payload = box(b"ftyp", b"mp42" + b"\x00" * 8) + box(b"moov", moov)
    info = probe_mp4(payload)
    assert info["brand"] == "mp42"
    assert info["duration_s"] == pytest.approx(90.5)
    assert info["n_tracks"] == 1
    assert (info["width"], info["height"]) == (640, 360)

    with pytest.raises(NotImplementedError):
        decode_mp4_frames(payload)

    with pytest.raises(ValueError):
        probe_mp4(b"\x00" * 16)
