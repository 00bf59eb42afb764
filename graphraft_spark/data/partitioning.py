"""Partition-shape helpers: keep fanout-heavy work off a single core.

A small parquet file (one row group) or a post-filter frame can arrive
as 1-2 read partitions; any explode / higher-order projection that
follows then runs on one core while the rest of the cluster idles.
Spark's file splitter cannot help (a row group is indivisible), so the
fix is an explicit round-robin repartition — GUARDED so it only fires
when the input is materially under-parallel.  On a real many-TB scan
the guard no-ops and the plan is untouched; when it does fire, the
shuffle it adds is tiny by construction (the input was small enough to
land in few partitions).

Found via bench drift (round 8): `documents.parquet` at sf0.1 reads as
ONE partition, so `t_decontaminate`'s 8-gram explode and `bm25_topk`'s
per-term frequency projection — both interpreted higher-order column
ops, the per-row-expensive kind — ran single-threaded on local[32]
(1.85 s -> 0.49 s for the explode after spreading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_repartition(df: DataFrame, target: int | None = None,
                       threshold_frac: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` partitions (default:
    the session's default parallelism) IFF its current partition count
    is below ``threshold_frac * target``; otherwise return it unchanged.

    Use directly before per-row-expensive fanout work (n-gram explode,
    per-term array scans, Pandas-UDF feature extraction) whose input
    may be a small file or a collapsed post-filter frame.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current < max(2, int(target * threshold_frac)):
        return df.repartition(target)
    return df
