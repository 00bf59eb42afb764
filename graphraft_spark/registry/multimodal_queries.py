"""Multimodal-column plumbing queries.

Binary payloads are synthesized deterministically from documents (the
container ships no media files); the mapInPandas decode stage uses the
deterministic fake decoder — Spark-side schema/batching/partitioning is
the real contract being exercised (SURVEY north-star: multimodal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.ops.multimodal import (
    extract_features,
    frame_sample_stub,
    synth_media_from_documents,
)
from graphraft_spark.registry import register


@register(
    "mm_media_metadata",
    oracle="""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN n_chars END AS width,
       CASE WHEN doc_id % 3 = 2 THEN n_chars * 10
            WHEN doc_id % 3 = 1 THEN n_chars * 5 END AS duration_ms
FROM documents
""")
def mm_media_metadata(spark, sf_dir):
    """Typed metadata over opaque binary payloads: kind, byte length,
    per-kind nullable dims — the schema contract for media tables."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    return m.select(
        "media_id", "kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        "width", "duration_ms")


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id AS media_id,
       unnest(range(0, greatest(1, CAST(floor(n_chars * 10 / 1000.0)
                                        AS BIGINT)))) AS frame_idx
FROM documents WHERE doc_id % 3 = 2
""")
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling contract: one row per sampled frame from
    duration metadata (decode stubbed; explode shape is real)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    return frame_sample_stub(m, every_ms=1000).select(
        "media_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))


@register("mm_feature_extract", extra=True)  # rows-only: Python decode stage
def mm_feature_extract(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (deterministic fake decoder standing in for PIL/ffmpeg)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = synth_media_from_documents(d)
    out = extract_features(m)
    return out.select("media_id", "kind", "n_bytes",
                      F.round(F.element_at("feature", 1), 6).alias("f0"))
