"""Round-9 edge cases from the round-8 advice pass: SCD2 open-version
(NULL valid_to) semantics, payload-tearing on NULL fields, and the
HITS zero-total normalization guard."""

from pyspark.sql import functions as F

from graphraft_spark.graph.algos import hits
from graphraft_spark.ops.temporal import scd2_lookup


def test_scd2_null_valid_to_is_open_version(spark):
    # Common SCD2 convention: the current version has valid_to = NULL.
    # A per-column last(ignorenulls) carry would skip the NULL and mask
    # against a STALE older boundary; the struct carry must not.
    facts = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 15), (3, 10, 500)],
        "fid int, k int, ts_sec bigint")
    dim = spark.createDataFrame(
        [(10, 0, 10, "v1"), (10, 10, None, "cur")],
        "k int, valid_from bigint, valid_to bigint, ver string")
    got = {r.fid: r.ver for r in scd2_lookup(
        facts, dim, key="k", ts_col="ts_sec", payload=("ver",)).collect()}
    assert got == {1: "v1", 2: "cur", 3: "cur"}


def test_scd2_null_payload_field_does_not_tear(spark):
    # The latest version's NULL payload field must stay NULL — not
    # inherit the previous version's value.
    facts = spark.createDataFrame([(1, 10, 15)],
                                  "fid int, k int, ts_sec bigint")
    dim = spark.createDataFrame(
        [(10, 0, 10, "v1", 100), (10, 10, 20, "v2", None)],
        "k int, valid_from bigint, valid_to bigint, ver string, score int")
    [row] = scd2_lookup(facts, dim, key="k", ts_col="ts_sec",
                        payload=("ver", "score")).collect()
    assert row.ver == "v2" and row.score is None


def test_scd2_fact_column_named_valid_to_ok(spark):
    # valid_to now travels inside the version struct, so a fact column
    # with the same name no longer collides.
    facts = spark.createDataFrame([(1, 10, 5, 999)],
                                  "fid int, k int, ts_sec bigint, "
                                  "valid_to bigint")
    dim = spark.createDataFrame(
        [(10, 0, 10, "v1")],
        "k int, valid_from bigint, valid_to bigint, ver string")
    [row] = scd2_lookup(facts, dim, key="k", ts_col="ts_sec",
                        payload=("ver",)).collect()
    assert row.ver == "v1" and row.valid_to == 999


def test_hits_edgeless_graph_zero_not_null(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "nodeId bigint")
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    rows = hits(nodes, edges, n_iter=2).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.hub == 0.0 and r.authority == 0.0


def test_asof_join_row_atomic_null_payload(spark):
    # merge_asof / DuckDB ASOF semantics: the MATCHED row's NULL field
    # stays NULL — never torn in from an earlier right row.
    from graphraft_spark.ops.temporal import asof_join
    left = spark.createDataFrame([(1, 10, 25)],
                                 "eid int, k int, ts bigint")
    right = spark.createDataFrame(
        [(10, 10, "a", 1), (10, 20, None, 2)],
        "k int, ts bigint, tag string, v int")
    [row] = asof_join(left, right, on="ts", by=("k",)).collect()
    assert row.v == 2 and row.tag is None


def test_asof_join_forward_row_atomic(spark):
    from graphraft_spark.ops.temporal import asof_join
    left = spark.createDataFrame([(1, 10, 5)],
                                 "eid int, k int, ts bigint")
    right = spark.createDataFrame(
        [(10, 10, None, 1), (10, 20, "b", 2)],
        "k int, ts bigint, tag string, v int")
    [row] = asof_join(left, right, on="ts", by=("k",),
                      direction="forward").collect()
    assert row.v == 1 and row.tag is None


def test_asof_join_parity_with_pandas_merge_asof(spark):
    # Independent-reference parity: random frames with NULL payload
    # fields, unique (key, ts) on the right (merge_asof tie order among
    # exact right duplicates is positional, which no shuffle engine
    # reproduces), both directions.
    import pandas as pd
    import random

    from graphraft_spark.ops.temporal import asof_join

    rng = random.Random(7)
    for direction in ("backward", "forward"):
        left = [(i, rng.randrange(3), rng.randrange(100))
                for i in range(60)]
        right_keys = {(rng.randrange(3), rng.randrange(100))
                      for _ in range(40)}
        right = [(k, ts, None if rng.random() < 0.3 else f"t{ts}",
                  rng.randrange(1000))
                 for (k, ts) in sorted(right_keys)]
        ldf = spark.createDataFrame(left, "eid int, k int, ts bigint")
        rdf = spark.createDataFrame(
            right, "k int, ts bigint, tag string, v int")
        got = {r.eid: (r.tag, r.v)
               for r in asof_join(ldf, rdf, on="ts", by=("k",),
                                  direction=direction).collect()}
        lp = pd.DataFrame(left, columns=["eid", "k", "ts"]) \
            .sort_values("ts").reset_index(drop=True)
        rp = pd.DataFrame(right, columns=["k", "ts", "tag", "v"]) \
            .sort_values("ts").reset_index(drop=True)
        mp = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
        for row in mp.itertuples():
            tag = None if pd.isna(row.tag) else row.tag
            v = None if pd.isna(row.v) else int(row.v)
            assert got[row.eid] == (tag, v), (direction, row.eid)
