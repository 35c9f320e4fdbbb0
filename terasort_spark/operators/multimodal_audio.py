"""Audio branch of the multimodal surface: windowed RMS energy +
zero-crossing rate over PCM samples — the features behind voice
activity detection, loudness filtering, and silence trimming in a
training-data pipeline.

Same stub boundary as the image/video stages (sources/media.py): the
container has no audio codecs, so ``media_type='fake/pcm'`` decodes the
payload bytes AS the sample stream (deterministic), and real formats
(audio/wav, audio/mp3) raise NotImplementedError where ffmpeg/soundfile
would slot in. The Spark-side plumbing — iterator mapInPandas, Arrow
batches, one output row per (blob, window) — is real and tested.

Scale notes: decode+features is a stateless narrow map: blobs stream
through in Arrow batches (never a whole partition in memory), each blob
expands to n_samples/WINDOW rows — bounded, known fan-out. No shuffle
until a consumer aggregates. 100 TB of audio parallelizes by file with
zero coordination.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.registry import register

WINDOW = 256  # samples per analysis window

# Formats that genuinely need external codecs (ffmpeg/soundfile).
UNSUPPORTED_AUDIO_FORMATS = ("audio/mp3", "audio/flac")


def decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV decode via the stdlib ``wave`` module — no external
    codec needed. Multi-channel audio is downmixed by averaging;
    samples normalize to [-1, 1)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:  # signed 16-bit LE
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:  # signed 32-bit LE
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x


def decode_pcm(payload: bytes, media_type: str) -> np.ndarray:
    """Decode an audio payload to float64 samples in [-1, 1).

    'audio/wav' is a REAL decode (stdlib ``wave``); 'fake/pcm' treats
    the payload bytes as centered int8 samples (deterministic test
    path); compressed formats still raise where ffmpeg/soundfile would
    slot in."""
    if media_type == "audio/wav":
        return decode_wav(payload)
    if media_type in UNSUPPORTED_AUDIO_FORMATS:
        raise NotImplementedError(
            f"no codec for {media_type} in this environment; "
            "install soundfile/ffmpeg and replace this stub"
        )
    if media_type != "fake/pcm":
        raise ValueError(f"unknown media_type {media_type!r}")
    return (
        np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0
    ) / 128.0


def audio_features_batched(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one output row per full analysis window —
    (doc_id, window_idx, rms x1e6, zero-crossings)."""
    for pdf in batches:
        doc_ids, widxs, rms, zcr = [], [], [], []
        for doc_id, payload, mt in zip(
            pdf["doc_id"], pdf["payload"], pdf["media_type"]
        ):
            samples = decode_pcm(bytes(payload), mt)
            n_win = len(samples) // WINDOW
            for w in range(n_win):
                chunk = samples[w * WINDOW : (w + 1) * WINDOW]
                doc_ids.append(doc_id)
                widxs.append(w)
                rms.append(
                    int(round(float(np.sqrt(np.mean(chunk**2))) * 1e6))
                )
                zcr.append(int(np.count_nonzero(np.diff(np.sign(chunk)))))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "window_idx": pd.Series(widxs, dtype="int64"),
                "rms_x1e6": pd.Series(rms, dtype="int64"),
                "n_zero_cross": pd.Series(zcr, dtype="int64"),
            }
        )


@register(
    "multimodal_audio",
    # Full SQL replay of the fake/pcm decode: payload byte i IS
    # ascii(char i) of documents.text (pure-ASCII corpus — guarded by
    # tests/test_llm.py::test_documents_text_is_ascii...), sample =
    # (byte - 128)/128, full 256-sample windows only. ASCII bytes are
    # all < 128 so every sample is negative — the zero-cross lag chain
    # still computes sign transitions generally rather than hardcoding
    # 0. Rounding note: Python's round() is banker's at an exact .5;
    # floor(x+0.5) is half-up — a sqrt landing exactly on a .5 at 1e6
    # scale is the only divergence point (measure-zero; same accepted
    # risk class as sim_cosine_gemm's BLAS boundary).
    oracle=f"""
WITH chars AS (
  SELECT doc_id,
         CAST(i - 1 AS BIGINT) AS pos,
         (ascii(substr(text, CAST(i AS INT), 1)) - 128.0) / 128.0 AS s,
         CAST(len(text) // {WINDOW} AS BIGINT) AS n_win
  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
  WHERE text IS NOT NULL
),
samples AS (
  SELECT doc_id,
         pos // {WINDOW} AS window_idx,
         s,
         CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END AS sgn,
         pos
  FROM chars
  WHERE pos // {WINDOW} < n_win
),
flagged AS (
  SELECT doc_id, window_idx, s,
         CASE WHEN lag(sgn) OVER w IS NOT NULL
               AND lag(sgn) OVER w <> sgn THEN 1 ELSE 0 END AS zc
  FROM samples
  WINDOW w AS (PARTITION BY doc_id, window_idx ORDER BY pos)
)
SELECT doc_id, window_idx,
       CAST(floor(sqrt(avg(s * s)) * 1000000 + 0.5) AS BIGINT) AS rms_x1e6,
       CAST(sum(zc) AS BIGINT) AS n_zero_cross
FROM flagged
GROUP BY doc_id, window_idx
""",
)
def multimodal_audio(spark, sf_dir):
    """Windowed audio features over binary payloads (documents.text
    bytes standing in for PCM): per 256-sample window, RMS energy
    (x1e6, integer — float-sum order never observable) and
    zero-crossing count. The downstream consumer drops silent/noisy
    windows exactly like a VAD filter would."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())  # no payload without bytes
        .select(
            "doc_id",
            F.encode(F.col("text"), "utf-8").alias("payload"),
            F.lit("fake/pcm").alias("media_type"),
        )
    )
    return d.mapInPandas(
        audio_features_batched,
        schema=(
            "doc_id bigint, window_idx bigint, "
            "rms_x1e6 bigint, n_zero_cross bigint"
        ),
    )
