"""Multimodal-column operators (north-star extension).

Images/audio/video are opaque ``binary`` payloads with typed metadata
columns; decode/feature-extract runs as Arrow-batched ``mapInPandas``
(the real plumbing — schema, batching, partitioning), with the actual
codec behind ``terasort_spark.sources.media.decode_image`` which is a
deterministic fake here (no image libs in this container) and raises
``NotImplementedError`` for real formats. See tests/test_multimodal.py
for the batch-shape and schema assertions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import o_rnd, rnd
from terasort_spark.registry import register


@register(
    "multimodal_join",
    oracle=f"""
SELECT d.doc_id, d.lang, d.n_chars, e.label,
       {o_rnd(
           "sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))",
           "emb_norm",
       )}
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def multimodal_join(spark, sf_dir):
    # Text + vector fused record: equi join on the shared key, flat
    # scalar projection (D5 — no raw array column in the hashed output).
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("emb", lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_chars", "label", rnd(norm, "emb_norm")
    )


@register("multimodal_features")  # pandas-UDF pipeline → rows-only check
def multimodal_features(spark, sf_dir):
    """Binary-column feature extraction through the real Arrow path:
    documents.text is packed into a binary payload column (standing in
    for image bytes), then a ``mapInPandas`` stage extracts per-blob
    features (byte length, sha1 prefix, fake 4x4 thumbnail mean) in
    vectorized pandas batches. The Spark-side plumbing — schema,
    iterator batching, partition preservation — is exactly what a real
    image decode would use; only the codec is faked."""
    from terasort_spark.sources.media import extract_features_batched

    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.encode(F.col("text"), "utf-8").alias("payload"),
            F.lit("fake/raw").alias("media_type"),
        )
    )
    out_schema = (
        "doc_id bigint, media_type string, n_bytes bigint, "
        "sha1_8 string, thumb_mean double"
    )
    return d.mapInPandas(extract_features_batched, schema=out_schema)


@register("multimodal_resize")  # Arrow-native pipeline → rows-only check
def multimodal_resize(spark, sf_dir):
    """Thumbnail resize (2x2 mean pool of the fake decode) through
    ``mapInArrow`` — one level below mapInPandas: the UDF consumes raw
    pyarrow RecordBatches, skipping pandas Series materialization
    entirely. For billions of small blobs that per-row object overhead
    is the difference between an IO-bound and a CPU-bound scan; the
    codec stays behind the same stub boundary as multimodal_features."""
    from terasort_spark.sources.media import resize_batched_arrow

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("fake/raw").alias("media_type"),
    )
    return d.mapInArrow(
        resize_batched_arrow,
        schema="doc_id bigint, p00 double, p01 double, p10 double, p11 double",
    )


@register("multimodal_framesample")  # pandas-UDF pipeline → rows-only check
def multimodal_framesample(spark, sf_dir):
    """Video frame sampling: each binary payload is treated as a frame
    container (fixed 64-byte "frames"); every k-th frame is selected and
    fingerprinted. The real decoder (pyav/ffmpeg) is absent in this
    container, so frame extraction is a deterministic stub behind the
    same boundary — the Spark-side contract (iterator mapInPandas,
    exploded one-row-per-sampled-frame output, bounded memory per
    batch) is the real, tested part. At 100 TB the payload column
    streams through Arrow batches; state never exceeds one batch."""
    import hashlib

    def sample_frames(batches, frame_bytes: int = 64, stride: int = 4):
        import pandas as pd

        for pdf in batches:
            out_doc, out_idx, out_n, out_fp = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, stride):
                    chunk = bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_n.append(n_frames)
                    out_fp.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "n_frames": out_n,
                    "frame_md5": out_fp,
                }
            )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(
        sample_frames,
        schema="doc_id bigint, frame_idx int, n_frames int, frame_md5 string",
    )
