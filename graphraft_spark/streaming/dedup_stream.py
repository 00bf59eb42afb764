"""Incremental near-duplicate detection over a DOCUMENT stream:
MinHash-LSH dedup where the corpus grows micro-batch by micro-batch.

``dropDuplicatesWithinWatermark`` (events.py) handles exact key
replays; this operator handles CONTENT near-dups arriving across
micro-batches — the incremental analog of ops/dedup.py's batch LSH
pipeline, and the shape a continuously-ingesting training-data
pipeline actually needs (flag each incoming doc against everything
already accepted, then admit it to the index).

Design (foreachBatch, same delta-log pattern as graph_updates.py):

* the INDEX is two epoch-partitioned parquet tables under
  ``index_dir`` — ``bands`` (id, band, bucket) and ``hashes``
  (id, hs) — appended once per micro-batch, overwriting the batch's
  own ``epoch=N`` partition so a replayed epoch is idempotent;
* each micro-batch computes signatures ONCE, finds candidates
  within the batch (band-bucket self-join) and against the existing
  index (equi-join on (band, bucket) — only colliding buckets are
  touched, never the whole corpus), verifies with exact Jaccard over
  the stored shingle-hash arrays, and appends surviving pairs to
  ``flags`` (id_a < id_b, jaccard);
* at scale the index tables are partitioned/bucketed by ``bucket``
  so the per-batch probe is a co-located join; the stored hs arrays
  make verification index-local (no reach-back to raw text).

Stream==batch contract (asserted in tests): after processing all
micro-batches, ``flags`` equals the one-shot batch
``minhash_lsh_dedup`` over the full corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphraft_spark.ops.dedup import (
    _h60,
    jaccard,
    lsh_bands,
    shingles,
    signature_from_hashes,
)

_EMPTY_BANDS = "id bigint, band int, bucket bigint"
_EMPTY_HASHES = "id bigint, hs array<bigint>"


def _epoch_dir(base: str, table: str, epoch_id: int) -> str:
    return os.path.join(base, table, f"epoch={epoch_id}")


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # existence must be checked eagerly: the parquet read is lazy, so a
    # missing first-epoch dir would otherwise explode at ACTION time,
    # past any try/except here (local FS is fine for the driver's
    # single-node contract; a cluster deployment points index_dir at a
    # shared FS and uses its client the same way)
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    # the epoch= partition column comes from directory discovery; declare
    # it so the explicit schema and the discovered layout agree
    return spark.read.schema(schema + ", epoch int").parquet(path) \
        .drop("epoch")


def process_dedup_batch(batch: DataFrame, epoch_id: int, index_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 8, bands: int = 4, k: int = 3,
                        threshold: float = 0.5, hash_fn=None) -> None:
    """One micro-batch of the incremental dedup (also directly callable
    for deterministic tests): flag batch docs against the index and each
    other, then admit the batch to the index.  Epoch-partition
    overwrites make the whole step idempotent under replay."""
    spark = batch.sparkSession
    rows = num_perm // bands

    sh = batch.select(F.col(id_col).alias("id"),
                      shingles(F.col(text_col), k).alias("sh"))
    hashed = sh.select(
        "id", F.transform(F.col("sh"), hash_fn or _h60).alias("hs")).persist()
    hashed.count()  # feeds banding, both verify sides, and the index write

    sig = hashed.select(
        "id", signature_from_hashes(F.col("hs"), num_perm).alias("sig"))
    banded = sig.select(
        "id", F.explode(lsh_bands(F.col("sig"), bands, rows)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket")).persist()
    banded.count()

    idx_bands = _read_or_empty(spark, os.path.join(index_dir, "bands"),
                               _EMPTY_BANDS)
    idx_hashes = _read_or_empty(spark, os.path.join(index_dir, "hashes"),
                                _EMPTY_HASHES)

    # within-batch candidate pairs (id_a < id_b) — built from the
    # already-persisted banded frame (candidates_from_hashes would
    # recompute signatures + banding from scratch every micro-batch)
    a, b = banded.alias("a"), banded.alias("b")
    within = (a.join(b, ["band", "bucket"])
              .filter(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
              .distinct())
    # cross pairs: batch docs probing existing index buckets
    cross = (
        banded.join(idx_bands.select(F.col("id").alias("old_id"),
                                     "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id") != F.col("old_id"))
        .select(F.least("id", "old_id").alias("id_a"),
                F.greatest("id", "old_id").alias("id_b"))
        .distinct()
    )
    all_hashes = idx_hashes.unionByName(hashed)
    flagged = (
        within.unionByName(cross).distinct()
        .join(all_hashes.select(F.col("id").alias("id_a"),
                                F.col("hs").alias("ha")), "id_a")
        .join(all_hashes.select(F.col("id").alias("id_b"),
                                F.col("hs").alias("hb")), "id_b")
        .withColumn("jaccard", jaccard(F.col("ha"), F.col("hb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

    flagged.write.mode("overwrite").parquet(
        _epoch_dir(index_dir, "flags", epoch_id))
    banded.write.mode("overwrite").parquet(
        _epoch_dir(index_dir, "bands", epoch_id))
    hashed.write.mode("overwrite").parquet(
        _epoch_dir(index_dir, "hashes", epoch_id))
    hashed.unpersist()
    banded.unpersist()


def stream_neardup_flags(doc_stream: DataFrame, index_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_perm: int = 8, bands: int = 4, k: int = 3,
                         threshold: float = 0.5) -> None:
    """Run the incremental dedup over a streaming DataFrame of documents
    with availableNow (drain everything, then stop)."""
    q = (
        doc_stream.writeStream
        .foreachBatch(lambda b, e: process_dedup_batch(
            b, e, index_dir, text_col, id_col, num_perm, bands, k,
            threshold))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def neardup_flags(spark: SparkSession, index_dir: str) -> DataFrame:
    """All near-dup pairs flagged so far (merge-on-read over epochs).
    Empty-safe: a stream that drained zero micro-batches never created
    the flags directory — return an empty, correctly-typed frame."""
    return _read_or_empty(spark, os.path.join(index_dir, "flags"),
                          "id_a bigint, id_b bigint, jaccard double") \
        .distinct()
