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


def test_zordered_files_bound_both_dimensions(spark, tmp_path):
    """Z-order vs 1-D sort: with points on a 100x100 grid, each
    Z-ordered file's bounding box must be tight in BOTH dims (a 1-D
    sort on x leaves y spanning the full domain in every file)."""
    from pyspark.sql import functions as F
    from graphraft_spark.data.sink import write_zordered

    pts = spark.range(10000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("bigint").alias("y"))
    out = str(tmp_path / "zorder")
    write_zordered(pts, out, "x", "y", n_files=16)

    boxes = []
    for f in _parquet_files(out):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        xs, ys = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                (xs if col.path_in_schema == "x" else ys).append(
                    (col.statistics.min, col.statistics.max))
        x_lo = min(a for a, _ in xs); x_hi = max(b for _, b in xs)
        y_lo = min(a for a, _ in ys); y_hi = max(b for _, b in ys)
        boxes.append((x_hi - x_lo, y_hi - y_lo))
    assert len(boxes) >= 8
    # The Z-order guarantee is distributional, not per-file: a file that
    # straddles a top-level quadrant boundary of the curve can span a
    # full dimension, but MOST files are tight in BOTH dims and the mean
    # box area is a fraction of the domain.  A 1-D sort on x would give
    # dy≈99 in EVERY file and mean area ≈ 99·(100/n_files)·n... domain-
    # scale; here it must stay under a quarter of the 100×100 domain.
    mean_area = sum(dx * dy for dx, dy in boxes) / len(boxes)
    assert mean_area < 0.25 * 100 * 100, boxes
    tight = sum(1 for dx, dy in boxes if dx <= 64 and dy <= 64)
    assert tight >= len(boxes) * 0.75, boxes
    wide_y = sum(1 for _, dy in boxes if dy >= 90)
    assert wide_y <= 2, boxes       # 1-D x-sort: every file would be
    total_rows = sum(pq.read_metadata(f).num_rows
                     for f in _parquet_files(out))
    assert total_rows == 10000
