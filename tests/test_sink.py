"""Layout-controlled sinks: the written FILE LAYOUT is the contract —
file counts per directory, range disjointness, and row fidelity."""

import glob
import os

import pyarrow.parquet as pq

from graphraft_spark.data.sink import (
    write_hive_partitioned,
    write_sized,
    write_sorted_ranges,
)


def _parquet_files(path):
    return [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True)
            if os.path.isfile(f)]


def test_write_sized_controls_file_count(spark, tmp_path):
    df = spark.range(1000).withColumnRenamed("id", "v")
    out = str(tmp_path / "sized")
    files = write_sized(df, out, rows_per_file=100)
    assert files == 10
    on_disk = _parquet_files(out)
    assert len(on_disk) == 10
    total = sum(pq.read_metadata(f).num_rows for f in on_disk)
    assert total == 1000


def test_hive_partitioned_bounded_files_per_dir(spark, tmp_path):
    # 3 partitions, heavy skew on one
    from pyspark.sql import functions as F
    df = spark.range(900).select(
        F.col("id"),
        F.when(F.col("id") < 700, "hot").otherwise(
            F.when(F.col("id") < 800, "warm").otherwise("cold"))
        .alias("part"))
    out = str(tmp_path / "hive")
    write_hive_partitioned(df, out, ["part"], files_per_partition=4)
    for p in ("hot", "warm", "cold"):
        n = len(_parquet_files(os.path.join(out, f"part={p}")))
        assert 1 <= n <= 4, (p, n)
    back = spark.read.parquet(out)
    assert back.count() == 900
    assert back.filter("part = 'hot'").count() == 700


def test_sorted_ranges_are_disjoint(spark, tmp_path):
    from pyspark.sql import functions as F
    df = spark.range(10000).select(
        F.pmod(F.col("id") * 2654435761, F.lit(10007)).alias("key"))
    out = str(tmp_path / "ranged")
    write_sorted_ranges(df, out, "key", n_files=8)
    ranges = []
    for f in _parquet_files(out):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        stats = md.row_group(0).column(0).statistics
        lo = stats.min
        hi = pq.read_metadata(f).row_group(md.num_row_groups - 1) \
            .column(0).statistics.max
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges
