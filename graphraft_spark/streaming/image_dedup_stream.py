"""Incremental perceptual IMAGE dedup over a media stream: the
foreachBatch twin of ops/image_dedup.py, the image analog of
streaming/dedup_stream.py (text minhash).

A continuously-ingesting crawl flags every incoming image against the
corpus already accepted — re-encoded/brightness-shifted copies of an
image admitted weeks ago must be caught the micro-batch they arrive,
without re-hashing the corpus.  Same delta-log pattern as the text
stream:

* the INDEX is one epoch-partitioned parquet table under
  ``index_dir`` — ``bands`` (id, band, bucket, w0, w1): the hash
  words are INLINE (two bigints, unlike the text stream's shingle
  arrays), so the cross-batch probe verifies Hamming directly on the
  joined rows with no reach-back join to a hashes table;
* each micro-batch decodes + aHashes its payloads once, finds
  candidates within the batch (band-bucket self-join) and against the
  existing index (equi-join on (band, bucket) — only colliding
  buckets are touched), verifies exact Hamming ≤ ``max_dist``, and
  appends surviving pairs to ``flags``;
* every write overwrites the batch's own ``epoch=N`` partition, so a
  replayed epoch is idempotent;
* at scale the bands table is partitioned/bucketed by ``bucket`` so
  the per-batch probe is a co-located join.

Stream==batch contract (tests/test_image_dedup_stream.py): after all
micro-batches drain, ``flags`` equals the one-shot
``image_neardup_pairs`` over the full corpus — banding at
bands > max_dist is recall-exact, and splitting arrival into epochs
only splits WHERE a pair is discovered (within-batch vs cross-batch),
never whether.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphraft_spark.ops.image_dedup import (
    WORD_BITS,
    hamming,
    hash_bands,
    image_ahash_words,
)
from graphraft_spark.streaming.dedup_stream import _epoch_dir, _read_or_empty

_EMPTY_BANDS = "id bigint, band int, bucket bigint, w0 bigint, w1 bigint"
_EMPTY_FLAGS = "id_a bigint, id_b bigint, dist int"


def process_image_batch(batch: DataFrame, epoch_id: int, index_dir: str,
                        decode_fn, id_col: str = "media_id",
                        payload_col: str = "payload",
                        max_dist: int = 3, bands: int = 4) -> None:
    """One micro-batch: decode + hash the payloads, flag against the
    index and within the batch, admit the batch's banded hashes."""
    from graphraft_spark.ops.multimodal import extract_features

    spark = batch.sparkSession
    feats = extract_features(
        batch.select(F.col(id_col).alias("media_id"),
                     F.lit("image").alias("kind"),
                     F.col(payload_col).alias("payload")),
        decode_fn=decode_fn)
    hashed = image_ahash_words(
        feats.select(F.col("media_id").alias("id"), "feature"),
        prefix="w")
    banded = (hashed.select("id", "w0", "w1", F.explode(
        hash_bands([F.col("w0"), F.col("w1")], bands)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"), "w0", "w1")
        .persist())
    banded.count()  # decode/hash once: feeds self-join, probe, and write

    idx = _read_or_empty(spark, os.path.join(index_dir, "bands"),
                         _EMPTY_BANDS)
    a, b = banded.alias("a"), banded.alias("b")
    within = (a.join(b, ["band", "bucket"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.col("a.w0").alias("w0a"), F.col("a.w1").alias("w1a"),
                      F.col("b.w0").alias("w0b"), F.col("b.w1").alias("w1b")))
    cross = (banded.join(
        idx.select(F.col("id").alias("old_id"), "band", "bucket",
                   F.col("w0").alias("ow0"), F.col("w1").alias("ow1")),
        ["band", "bucket"])
        .filter(F.col("id") != F.col("old_id"))
        .select(F.least("id", "old_id").alias("id_a"),
                F.greatest("id", "old_id").alias("id_b"),
                # words follow their ids through the least/greatest swap
                F.when(F.col("id") < F.col("old_id"), F.col("w0"))
                .otherwise(F.col("ow0")).alias("w0a"),
                F.when(F.col("id") < F.col("old_id"), F.col("w1"))
                .otherwise(F.col("ow1")).alias("w1a"),
                F.when(F.col("id") < F.col("old_id"), F.col("ow0"))
                .otherwise(F.col("w0")).alias("w0b"),
                F.when(F.col("id") < F.col("old_id"), F.col("ow1"))
                .otherwise(F.col("w1")).alias("w1b")))
    dist = (hamming(F.col("w0a"), F.col("w0b"), WORD_BITS)
            + hamming(F.col("w1a"), F.col("w1b"), WORD_BITS))
    flagged = (within.unionByName(cross).distinct()
               .withColumn("dist", dist)
               .filter(F.col("dist") <= max_dist)
               .select("id_a", "id_b",
                       F.col("dist").cast("int").alias("dist")))

    flagged.write.mode("overwrite").parquet(
        _epoch_dir(index_dir, "flags", epoch_id))
    banded.write.mode("overwrite").parquet(
        _epoch_dir(index_dir, "bands", epoch_id))
    banded.unpersist()


def stream_image_neardup_flags(media_stream: DataFrame, index_dir: str,
                               decode_fn, id_col: str = "media_id",
                               payload_col: str = "payload",
                               max_dist: int = 3, bands: int = 4) -> None:
    """Drain the media stream through the incremental dedup
    (availableNow: process everything staged, then stop)."""
    q = (media_stream.writeStream
         .foreachBatch(lambda b, e: process_image_batch(
             b, e, index_dir, decode_fn, id_col, payload_col,
             max_dist, bands))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def image_neardup_stream_flags(spark: SparkSession,
                               index_dir: str) -> DataFrame:
    """All image near-dup pairs flagged so far (merge-on-read over
    epochs); empty-safe before the first micro-batch."""
    return _read_or_empty(spark, os.path.join(index_dir, "flags"),
                          _EMPTY_FLAGS)
