"""Schema contract against the driver's testdata (TESTDATA.md).

The driver regenerates /root/testdata between rounds and has drifted
types before (round 3: events.ts TIMESTAMP(NANOS)→timestamp[us], which
silently broke every streaming/temporal query and the whole bench).
These tests turn any such drift into a one-second, readable failure.

Footer-only pyarrow reads keep this nearly free; one real load_events
call asserts the adaptive loader normalizes whatever the driver wrote.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

TESTDATA = "/root/testdata"
SF_DIRS = sorted(glob.glob(f"{TESTDATA}/sf*"))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# columns each query family depends on (names only — types are checked
# where the engine actually branches on them)
REQUIRED_COLUMNS = {
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source"},
    "embeddings": {"vec_id", "embedding", "label"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                 "l_linestatus", "l_shipdate"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "region": {"r_regionkey", "r_name"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_all_tables_present_with_required_columns(sf_dir):
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        assert os.path.exists(path), f"driver table missing: {path}"
        names = set(pq.read_schema(path).names)
        missing = REQUIRED_COLUMNS.get(t, set()) - names
        assert not missing, (
            f"{path}: driver schema drifted — missing columns {sorted(missing)}; "
            f"has {sorted(names)}")


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_ts_is_loader_supported(sf_dir):
    """The raw ts type must be one load_events knows how to normalize:
    int64 epoch-nanos or a parquet timestamp (any unit/tz)."""
    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    assert pa_is_timestamp_or_int64(t), (
        f"events.ts drifted to {t}; teach "
        "graphraft_spark/streaming/events.py:_with_event_time about it")


def pa_is_timestamp_or_int64(t):
    import pyarrow as pa
    return pa.types.is_timestamp(t) or t == pa.int64()


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_load_events_normalizes_ts(spark, sf_dir):
    """load_events must yield ts: timestamp (LTZ — watermark-compatible)
    for every sf dir, whatever the driver stored."""
    from pyspark.sql.types import TimestampType

    from graphraft_spark.streaming.events import load_events

    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"]
    assert set(df.columns) >= REQUIRED_COLUMNS["events"]


def test_embeddings_are_float_arrays():
    import pyarrow as pa

    t = pq.read_schema(f"{SF_DIRS[0]}/embeddings.parquet").field("embedding").type
    assert pa.types.is_list(t) or pa.types.is_large_list(t) or \
        pa.types.is_fixed_size_list(t), t
    assert pa.types.is_floating(t.value_type), t


def test_source_fingerprint_tracks_regeneration(tmp_path):
    """The graph-cache marker must change when the driver regenerates a
    source table (new size or mtime), so stale materializations rebuild."""
    import os
    import time

    from graphraft_spark.graph.tpch import source_fingerprint

    p = tmp_path / "orders.parquet"
    p.write_bytes(b"v1")
    fp1 = source_fingerprint(str(tmp_path), ("orders",))
    os.utime(p, (time.time() + 10, time.time() + 10))
    fp2 = source_fingerprint(str(tmp_path), ("orders",))
    assert fp1 != fp2
    p.write_bytes(b"v2-bigger")
    assert source_fingerprint(str(tmp_path), ("orders",)) != fp2
    assert "absent" in source_fingerprint(str(tmp_path), ("missing",))


def test_graph_memo_invalidates_on_source_change(spark, tmp_path):
    """The in-process graph memo must re-validate the source fingerprint
    on every call — a regenerated source table rebuilds the graph even
    within one long-lived session (the round-3 failure mode)."""
    import shutil

    from pyspark.sql import functions as F

    from graphraft_spark.graph.tpch import tpch_graph

    src = tmp_path / "sfX"
    src.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    src / f"{t}.parquet")
    g1 = tpch_graph(spark, str(src))
    n1 = g1.nodes.count()

    # "regenerate" customers: drop half the rows (new size + mtime)
    cust = spark.read.parquet(str(src / "customer.parquet"))
    kept = cust.filter(F.col("c_custkey") % 2 == 0)
    n_dropped = cust.count() - kept.count()
    tmp_out = tmp_path / "cust_new"
    kept.coalesce(1).write.parquet(str(tmp_out))
    import glob
    shutil.copy(glob.glob(str(tmp_out / "part-*"))[0],
                src / "customer.parquet")

    g2 = tpch_graph(spark, str(src))
    assert g2.nodes.count() == n1 - n_dropped, \
        "memoized graph served stale data after source regeneration"
