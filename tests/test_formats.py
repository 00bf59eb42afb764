"""CSV/ORC source-sink round-trips (sources/formats.py) + the
malformed-row contract, plus round-8 lazy ops: resample_ffill grid and
bipartite projection caps."""

import os

import pytest
from pyspark.sql import functions as F

from graphraft_spark.sources.formats import (read_csv, read_orc,
                                             write_csv, write_orc)

SF = "/root/testdata/sf0.001"
# Matches the testdata file exactly: multiLine reads (the lossless
# default) disable CSV column pruning, so a declared-but-absent column
# now malforms every row instead of being null-padded away.
NATION_DDL = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"


def test_csv_roundtrip(spark, tmp_path):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, NATION_DDL)
    assert {tuple(r) for r in back.select(*nation.columns).collect()} \
        == {tuple(r) for r in nation.collect()}


def test_csv_malformed_dropped_or_failfast(spark, tmp_path):
    path = str(tmp_path / "bad")
    os.makedirs(path)
    with open(os.path.join(path, "p.csv"), "w") as fh:
        fh.write("a,b\n1,x\nnot_an_int,y\n2,z\n")
    ddl = "a BIGINT, b STRING"
    got = read_csv(spark, path, ddl).collect()
    assert {(r.a, r.b) for r in got} == {(1, "x"), (2, "z")}
    with pytest.raises(Exception):
        read_csv(spark, path, ddl, strict=True).collect()


def test_orc_roundtrip_partitioned(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, partition_by=("lang",))
    back = read_orc(spark, path)
    assert back.count() == 40
    assert {tuple(r) for r in back.select("doc_id", "text").collect()} \
        == {tuple(r) for r in docs.select("doc_id", "text").collect()}


def test_resample_ffill_grid_and_fill(spark):
    from graphraft_spark.ops.temporal import resample_ffill
    df = spark.createDataFrame(
        [("u", 5, 1.0), ("u", 8, 2.0),       # same bucket 0 (step 10)
         ("u", 35, 9.0),                      # bucket 30; gap at 10,20
         ("v", 100, 7.0)],
        "k string, ts_sec bigint, value double")
    out = {(r.k, r.bucket_ts): (r.value_ffill, r.is_observed)
           for r in resample_ffill(df, key="k", step=10).collect()}
    assert out == {("u", 0): (2.0, True),     # max within bucket
                   ("u", 10): (2.0, False),   # ffilled
                   ("u", 20): (2.0, False),
                   ("u", 30): (9.0, True),
                   ("v", 100): (7.0, True)}   # singleton grid
    with pytest.raises(ValueError):
        resample_ffill(df, key="k", step=0)


def test_bipartite_project_cap(spark):
    from graphraft_spark.graph.algos import bipartite_project
    # baskets: r1={1,2,3}, r2={1,2}, hub={1,2,3,4} (degree 4)
    rows = [(x, "r1") for x in (1, 2, 3)] + \
           [(x, "r2") for x in (1, 2)] + \
           [(x, "hub") for x in (1, 2, 3, 4)]
    e = spark.createDataFrame(rows, "src bigint, dst string")
    got = {(r.a, r.b): r.weight
           for r in bipartite_project(e, left="src", right="dst").collect()}
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2,
                   (1, 4): 1, (2, 4): 1, (3, 4): 1}
    capped = {(r.a, r.b): r.weight
              for r in bipartite_project(e, left="src", right="dst",
                                         max_degree=3).collect()}
    assert capped == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    filt = {(r.a, r.b): r.weight
            for r in bipartite_project(e, left="src", right="dst",
                                       min_count=2).collect()}
    assert filt == {(1, 2): 3, (1, 3): 2, (2, 3): 2}


def test_csv_roundtrip_embedded_newlines(spark, tmp_path):
    """read_csv's multiLine default keeps quoted text fields containing
    newlines intact (ADVICE r9: without it the row is split mid-record
    and silently DROPMALFORMED'd — data loss)."""
    df = spark.createDataFrame(
        [(1, "line one\nline two", 10), (2, 'quote " and, comma', 20)],
        "id bigint, text string, n bigint")
    p = str(tmp_path / "nl_csv")
    write_csv(df, p)
    back = read_csv(spark, p, "id bigint, text string, n bigint")
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == {1: "line one\nline two", 2: 'quote " and, comma'}
