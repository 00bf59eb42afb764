"""Incremental signature-table maintenance (streaming/
signature_maintenance.py): affected-only recompute per epoch must
converge to the full batch enumeration, recompute strictly fewer
questions than bootstrap, and replay idempotently."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2026, 1, 1, h)) for u, t, h in rows],
        "user_id bigint, event_type string, ts timestamp")


@pytest.fixture()
def setup(spark, tmp_path):
    from graphraft_spark.streaming.graph_updates import apply_delta_batch
    from graphraft_spark.streaming.signature_maintenance import (
        maintain_signatures,
    )

    delta_dir = str(tmp_path / "deltas")
    sig_dir = str(tmp_path / "sigs")
    anchors = spark.createDataFrame(
        [(1, "user_1"), (2, "user_2"), (3, "user_3")],
        "qid bigint, name string")

    batch1 = _events(spark, [(1, "A", 0), (2, "B", 1)])
    batch2 = _events(spark, [(3, "A", 2)])

    apply_delta_batch(batch1, 0, delta_dir)
    maintain_signatures(spark, delta_dir, sig_dir, anchors, epoch_id=0)
    apply_delta_batch(batch2, 1, delta_dir)
    maintain_signatures(spark, delta_dir, sig_dir, anchors, epoch_id=1)
    return delta_dir, sig_dir, anchors


def _key(r):
    return (r["qid"], r["pattern"], r["label1"], r["name1"], r["type1"],
            r["label2"], r["type2"], r["label3"], r["totalCnt"])


def test_incremental_equals_full_batch(spark, setup):
    from graphraft_spark.patterns.enumerate import enumerate_paths_batch
    from graphraft_spark.streaming.graph_updates import merged_graph
    from graphraft_spark.streaming.signature_maintenance import (
        read_signatures,
    )

    delta_dir, sig_dir, anchors = setup
    got = {_key(r) for r in read_signatures(spark, sig_dir).collect()}
    want = {_key(r) for r in enumerate_paths_batch(
        merged_graph(spark, delta_dir), anchors,
        patterns=("1hop", "2hop")).collect()}
    assert got == want and len(want) > 3
    # the new user_3-A edge must be visible from user_1 via 2 hops
    assert any(k[0] == 1 and k[1] == "2hop" for k in got)


def test_epoch_recomputes_only_affected_questions(spark, setup):
    delta_dir, sig_dir, anchors = setup
    ep1 = spark.read.parquet(f"{sig_dir}/epoch=1")
    qids = {r["qid"] for r in ep1.select("qid").distinct().collect()}
    # batch2 touches user_3 and type A; user_1 is 1 hop from A, so q1
    # and q3 recompute — q2 (user_2, only near B) must NOT
    assert qids == {1, 3}


def test_epoch_replay_is_idempotent(spark, setup):
    from graphraft_spark.streaming.signature_maintenance import (
        maintain_signatures,
        read_signatures,
    )

    delta_dir, sig_dir, anchors = setup
    before = {_key(r) for r in read_signatures(spark, sig_dir).collect()}
    maintain_signatures(spark, delta_dir, sig_dir, anchors, epoch_id=1)
    maintain_signatures(spark, delta_dir, sig_dir, anchors, epoch_id=1)
    after = {_key(r) for r in read_signatures(spark, sig_dir).collect()}
    assert after == before


def test_tombstones_supersede_older_epochs(spark, tmp_path):
    """A question recomputed to ZERO signatures must not resurrect its
    older rows through merge-on-read."""
    from graphraft_spark.graph.model import PropertyGraph
    from graphraft_spark.streaming.signature_maintenance import (
        read_signatures,
        recompute_epoch,
    )

    sig_dir = str(tmp_path / "sigs2")
    anchors = spark.createDataFrame([(1, "n1")], "qid bigint, name string")
    g_full = PropertyGraph(
        nodes=spark.createDataFrame(
            [(1, "N", "n1"), (2, "N", "n2")],
            "nodeId bigint, label string, name string"),
        edges=spark.createDataFrame(
            [(10, 1, 2, "R")],
            "edgeId bigint, src bigint, dst bigint, relType string"))
    g_empty = PropertyGraph(
        nodes=g_full.nodes,
        edges=g_full.edges.limit(0))
    qids = anchors.select("qid").distinct()
    recompute_epoch(spark, g_full, anchors, qids, 0, sig_dir)
    assert read_signatures(spark, sig_dir).count() > 0
    recompute_epoch(spark, g_empty, anchors, qids, 1, sig_dir)
    assert read_signatures(spark, sig_dir).count() == 0


def test_empty_log_reads_as_empty_frame(spark, tmp_path):
    from graphraft_spark.streaming.signature_maintenance import (
        read_signatures,
    )

    df = read_signatures(spark, str(tmp_path / "never_written"))
    assert df.count() == 0
    assert "qid" in df.columns and "totalCnt" in df.columns
