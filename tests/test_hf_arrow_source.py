"""Executor-parallel hfarrow data source: shard-per-partition reads,
column pruning, filter pushdown semantics, and parity with both the
driver-side reader and the real reference artifacts."""

import os

import pyarrow as pa
import pytest

from graphraft_spark.sources import read_hf_split_distributed

MAG_VALID = "/root/reference/mag-data/qa_with_cypher_queries/valid"


def _write_split(tmp_path, n_files=3, rows_per_batch=40, batches=2):
    """An HF save_to_disk-style split dir: data-N-of-M.arrow IPC
    streams, multiple batches per file."""
    schema = pa.schema([("id", pa.int64()), ("text", pa.string()),
                        ("score", pa.float64())])
    next_id = 0
    for i in range(n_files):
        f = os.path.join(str(tmp_path),
                         f"data-{i:05d}-of-{n_files:05d}.arrow")
        with pa.OSFile(f, "wb") as sink:
            with pa.ipc.new_stream(sink, schema) as w:
                for _ in range(batches):
                    ids = list(range(next_id, next_id + rows_per_batch))
                    next_id += rows_per_batch
                    w.write_batch(pa.record_batch(
                        [pa.array(ids),
                         pa.array([f"doc {j}" for j in ids]),
                         pa.array([j / 10.0 for j in ids])],
                        schema=schema))
    return str(tmp_path), next_id


def test_reads_all_rows_one_partition_per_shard(spark, tmp_path):
    d, total = _write_split(tmp_path)
    df = read_hf_split_distributed(spark, d)
    assert df.count() == total
    assert df.rdd.getNumPartitions() == 3          # shard-parallel
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(total))


def test_column_pruning_and_values(spark, tmp_path):
    d, total = _write_split(tmp_path)
    df = read_hf_split_distributed(spark, d).select("text")
    rows = df.collect()
    assert len(rows) == total
    assert rows[0].asDict().keys() == {"text"}


def test_filter_pushdown_matches_postfilter(spark, tmp_path):
    d, total = _write_split(tmp_path)
    df = read_hf_split_distributed(spark, d)
    pushed = df.filter("id >= 100 AND score < 20.0").collect()
    want = [i for i in range(total) if i >= 100 and i / 10.0 < 20.0]
    assert sorted(r["id"] for r in pushed) == want


def test_unsupported_filters_still_exact(spark, tmp_path):
    d, total = _write_split(tmp_path)
    df = read_hf_split_distributed(spark, d)
    # IN + LIKE go back to Spark; result must still be exact.
    got = df.filter("id IN (1, 5, 7) OR text LIKE '% 9'").collect()
    assert sorted(r["id"] for r in got) == [1, 5, 7, 9]


@pytest.mark.skipif(not os.path.isdir(MAG_VALID),
                    reason="reference artifacts absent")
def test_parity_with_driver_side_reader_on_reference_data(spark):
    from graphraft_spark.data.hf_arrow import read_hf_split

    dist = read_hf_split_distributed(spark, MAG_VALID)
    drv = read_hf_split(spark, MAG_VALID)
    assert dist.count() == drv.count()
    key = "qid" if "qid" in dist.columns else dist.columns[0]
    a = {r[key] for r in dist.select(key).collect()}
    b = {r[key] for r in drv.select(key).collect()}
    assert a == b
