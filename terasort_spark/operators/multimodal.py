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
        resize_batched_arrow, schema="doc_id bigint, thumb array<double>"
    )
