"""Incremental maintenance of the enumeration signature table over a
streaming graph (extension — the reference recomputes retrieval data
from scratch against a static Neo4j graph).

The signature table (enumerate_paths_batch output: per-question path
signatures with distinct-target counts) is a materialized view of the
graph.  Full incremental view maintenance for COUNT(DISTINCT) requires
per-target refcount state; the production-practical alternative
implemented here is AFFECTED-PARTITION RECOMPUTE:

1. each micro-batch lands graph deltas in the epoch log
   (streaming/graph_updates.py);
2. the anchors whose ``hops``-hop neighborhood a delta edge can touch
   are identified (endpoints + their (hops-1)-neighborhood, one
   frontier expansion per extra hop — delta-sized, not graph-sized);
3. ONLY those questions' signatures are re-enumerated against the
   merged graph and written to ``epoch=N`` of the signature log
   (overwrite → idempotent replay, same guarantee as the delta log);
4. readers take each question's rows from its LATEST epoch
   (merge-on-read; compaction folds the log like compact_deltas).

Cost per epoch is O(affected questions), not O(all questions): a delta
touching one paper re-enumerates the handful of questions anchored
near it, while the other ten thousand stay untouched — the standard
scale pattern when exact IVM state would dwarf the view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphraft_spark.graph.model import PropertyGraph

SIG_COLS = ("pattern", "label1", "name1", "type1", "label2", "type2",
            "label3", "name3", "totalCnt")


def affected_question_ids(merged: PropertyGraph, anchors: DataFrame,
                          delta_edges: DataFrame, hops: int = 2) -> DataFrame:
    """(qid) frame: questions whose anchor sits within ``hops-1``
    undirected hops of a delta-edge endpoint — exactly the anchors
    whose ``hops``-hop enumeration can see the new edge."""
    frontier = (delta_edges.select(F.col("src").alias("nodeId"))
                .unionByName(delta_edges.select(F.col("dst").alias("nodeId")))
                .distinct())
    und = merged.undirected_edges
    for _ in range(hops - 1):
        nbrs = (und.join(frontier, und["src"] == frontier["nodeId"])
                .select(und["dst"].alias("nodeId")))
        frontier = frontier.unionByName(nbrs).distinct()
    return (merged.nodes.join(frontier, "nodeId")
            .join(F.broadcast(anchors.select("qid", "name")), "name")
            .select("qid").distinct())


def _sig_epoch_dir(sig_dir: str, epoch_id: int) -> str:
    return os.path.join(sig_dir, f"epoch={epoch_id}")


def recompute_epoch(spark: SparkSession, merged: PropertyGraph,
                    anchors: DataFrame, qids: DataFrame, epoch_id: int,
                    sig_dir: str,
                    patterns=("1hop", "2hop"),
                    specific_target_label: str | None = None) -> None:
    """Re-enumerate ONLY ``qids`` against the merged graph; land the
    rows (plus the epoch bookkeeping column) in the epoch's partition.
    A question whose recompute yields zero signatures still gets a
    tombstone row so merge-on-read supersedes its older epochs."""
    from graphraft_spark.patterns.enumerate import enumerate_paths_batch

    sub = anchors.join(F.broadcast(qids), "qid")
    sigs = enumerate_paths_batch(
        merged, sub, patterns=patterns,
        specific_target_label=specific_target_label)
    tombstones = qids.select(
        "qid", *[F.lit(None).cast("string").alias(c) for c in SIG_COLS[:-1]],
        F.lit(None).cast("bigint").alias("totalCnt"))
    out = sigs.select("qid", *SIG_COLS).unionByName(tombstones)
    out.write.mode("overwrite").parquet(_sig_epoch_dir(sig_dir, epoch_id))


def maintain_signatures(spark: SparkSession, delta_dir: str, sig_dir: str,
                        anchors: DataFrame, epoch_id: int,
                        base: PropertyGraph | None = None,
                        patterns=("1hop", "2hop"),
                        specific_target_label: str | None = None,
                        hops: int = 2) -> None:
    """foreachBatch companion to ``apply_delta_batch``: AFTER the
    epoch's deltas land, refresh the affected questions' signatures.
    ``epoch_id == 0`` (or a missing signature log) bootstraps the full
    table.  Idempotent per epoch (partition overwrite)."""
    from graphraft_spark.streaming.graph_updates import merged_graph

    merged = merged_graph(spark, delta_dir, base=base)
    bootstrap = epoch_id == 0 or not os.path.isdir(sig_dir)
    if bootstrap:
        qids = anchors.select("qid").distinct()
    else:
        delta = spark.read.parquet(
            os.path.join(delta_dir, "edges_delta", f"epoch={epoch_id}"))
        qids = affected_question_ids(merged, anchors, delta, hops=hops)
    recompute_epoch(spark, merged, anchors, qids, epoch_id, sig_dir,
                    patterns=patterns,
                    specific_target_label=specific_target_label)


def read_signatures(spark: SparkSession, sig_dir: str) -> DataFrame:
    """Merge-on-read: per question, the rows of its LATEST epoch
    (tombstone rows drop out after the winner is chosen).  A signature
    log that was never written reads as an empty, correctly-typed
    frame (no PATH_NOT_FOUND on a zero-delta stream)."""
    if not os.path.isdir(sig_dir):
        return spark.createDataFrame(
            [], "qid bigint, " + ", ".join(
                f"{c} string" for c in SIG_COLS[:-1]) + ", totalCnt bigint")
    df = spark.read.option("basePath", sig_dir).parquet(sig_dir)
    latest = df.groupBy("qid").agg(F.max("epoch").alias("epoch"))
    return (df.join(latest, ["qid", "epoch"])
            .filter(F.col("pattern").isNotNull())
            .drop("epoch"))
