"""Incremental perceptual MEDIA dedup over a stream: the foreachBatch
twin of ops/image_dedup.py, the media analog of
streaming/dedup_stream.py (text minhash).

A continuously-ingesting crawl flags every incoming image/clip against
the corpus already accepted — re-encoded/brightness-shifted copies of
an item admitted weeks ago must be caught the micro-batch they arrive,
without re-hashing the corpus.  Same delta-log pattern as the text
stream:

* the INDEX is one epoch-partitioned parquet table under
  ``index_dir`` — ``bands`` (id, band, bucket, w0..w{k-1}): the hash
  words are INLINE (k bigints, unlike the text stream's shingle
  arrays), so the cross-batch probe verifies Hamming directly on the
  joined rows with no reach-back join to a hashes table;
* each micro-batch decodes + hashes its payloads once, finds
  candidates within the batch (band-bucket self-join) and against the
  existing index (equi-join on (band, bucket) — only colliding
  buckets are touched), verifies exact Hamming ≤ ``max_dist``, and
  appends surviving pairs to ``flags``;
* every write overwrites the batch's own ``epoch=N`` partition, so a
  replayed epoch is idempotent;
* at scale the bands table is partitioned/bucketed by ``bucket`` so
  the per-batch probe is a co-located join.

The fingerprint is pluggable (r13): the default is the single-image
64-bit aHash (two words); a video stream passes ``hash_fn=`` the
128-bit sampled-frame clip fingerprint (ops/image_dedup.py
video_ahash_words) with ``n_words=4, bands=8, max_dist=6`` — the same
index/probe dataflow at every width, because hash_bands and the
Hamming verify generalize over the word list.

Stream==batch contract (tests/test_image_dedup_stream.py,
tests/test_video_dedup_stream.py): after all micro-batches drain,
``flags`` equals the one-shot ``image_neardup_pairs`` over the full
corpus — banding at bands > max_dist is recall-exact, and splitting
arrival into epochs only splits WHERE a pair is discovered
(within-batch vs cross-batch), never whether.
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

_EMPTY_FLAGS = "id_a bigint, id_b bigint, dist int"


def _bands_schema(n_words: int) -> str:
    words = ", ".join(f"w{i} bigint" for i in range(n_words))
    return f"id bigint, band int, bucket bigint, {words}"


def process_image_batch(batch: DataFrame, epoch_id: int, index_dir: str,
                        decode_fn, id_col: str = "media_id",
                        payload_col: str = "payload",
                        max_dist: int = 3, bands: int = 4,
                        hash_fn=None, n_words: int = 2,
                        kind: str = "image") -> None:
    """One micro-batch: decode + hash the payloads, flag against the
    index and within the batch, admit the batch's banded hashes.
    ``hash_fn``: (id, feature) frame → word columns ``w0..w{n_words-1}``
    (default: the 64-bit aHash)."""
    from graphraft_spark.ops.multimodal import extract_features

    spark = batch.sparkSession
    ws = [f"w{i}" for i in range(n_words)]
    if hash_fn is None:
        hash_fn = lambda df: image_ahash_words(df, prefix="w")  # noqa: E731
    feats = extract_features(
        batch.select(F.col(id_col).alias("media_id"),
                     F.lit(kind).alias("kind"),
                     F.col(payload_col).alias("payload")),
        decode_fn=decode_fn)
    hashed = hash_fn(feats.select(F.col("media_id").alias("id"), "feature"))
    banded = (hashed.select("id", *ws, F.explode(
        hash_bands([F.col(w) for w in ws], bands)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"), *ws)
        .persist())
    banded.count()  # decode/hash once: feeds self-join, probe, and write

    idx = _read_or_empty(spark, os.path.join(index_dir, "bands"),
                         _bands_schema(n_words))
    a, b = banded.alias("a"), banded.alias("b")
    within = (a.join(b, ["band", "bucket"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      *[F.col(f"a.{w}").alias(f"{w}a") for w in ws],
                      *[F.col(f"b.{w}").alias(f"{w}b") for w in ws]))
    new_lt_old = F.col("id") < F.col("old_id")
    cross = (banded.join(
        idx.select(F.col("id").alias("old_id"), "band", "bucket",
                   *[F.col(w).alias(f"o{w}") for w in ws]),
        ["band", "bucket"])
        .filter(F.col("id") != F.col("old_id"))
        .select(F.least("id", "old_id").alias("id_a"),
                F.greatest("id", "old_id").alias("id_b"),
                # words follow their ids through the least/greatest swap
                *[F.when(new_lt_old, F.col(w)).otherwise(F.col(f"o{w}"))
                  .alias(f"{w}a") for w in ws],
                *[F.when(new_lt_old, F.col(f"o{w}")).otherwise(F.col(w))
                  .alias(f"{w}b") for w in ws]))
    dist = sum((hamming(F.col(f"{w}a"), F.col(f"{w}b"), WORD_BITS)
                for w in ws[1:]),
               hamming(F.col(f"{ws[0]}a"), F.col(f"{ws[0]}b"), WORD_BITS))
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
                               max_dist: int = 3, bands: int = 4,
                               hash_fn=None, n_words: int = 2,
                               kind: str = "image") -> None:
    """Drain the media stream through the incremental dedup
    (availableNow: process everything staged, then stop)."""
    q = (media_stream.writeStream
         .foreachBatch(lambda b, e: process_image_batch(
             b, e, index_dir, decode_fn, id_col, payload_col,
             max_dist, bands, hash_fn, n_words, kind))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def image_neardup_stream_flags(spark: SparkSession,
                               index_dir: str) -> DataFrame:
    """All media near-dup pairs flagged so far (merge-on-read over
    epochs); empty-safe before the first micro-batch."""
    return _read_or_empty(spark, os.path.join(index_dir, "flags"),
                          _EMPTY_FLAGS)
