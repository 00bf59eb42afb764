"""Layout-controlled parquet sinks — the write-path half of the 100 TB
story.

At fleet scale the writer, not the reader, decides performance: a
shuffle with 2,000 reducers writing a 10-partition Hive layout produces
20,000 tiny files (the classic small-files explosion), and a skewed
partition column turns one writer task into the job's critical path.
These helpers make file layout an explicit, tested contract:

- ``write_sized``: fixed target of rows per output file via ONE
  round-robin repartition sized from a cheap count — no
  maxRecordsPerFile surprises (that conf splits files but leaves the
  task count alone, so it fixes file SIZE while leaving the
  one-writer-per-task parallelism problem).
- ``write_hive_partitioned``: repartition BY THE PARTITION COLUMNS
  (plus an optional intra-partition salt for file-count control and
  writer parallelism under skew) so each Hive directory is written by
  exactly ``files_per_partition`` tasks — the layout stays
  O(partitions·files_per_partition) no matter how many reducers the
  upstream shuffle used.
- ``write_sorted_ranges``: range-repartition + in-file sort on a key →
  non-overlapping min/max column statistics per file, which is what
  makes engines skip files on key predicates (the poor man's
  clustering/Z-order for the 1-D case).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sized(df: DataFrame, path: str, rows_per_file: int,
                mode: str = "overwrite") -> int:
    """Write ``df`` as ~``rows_per_file``-row parquet files; returns the
    file count.  One extra job for the count — at scale, feed a known
    row count instead via ``df.persist()`` reuse or metadata."""
    n = df.count()
    files = max(1, math.ceil(n / rows_per_file))
    df.repartition(files).write.mode(mode).parquet(path)
    return files


def write_hive_partitioned(df: DataFrame, path: str,
                           partition_cols: list[str],
                           files_per_partition: int = 1,
                           mode: str = "overwrite") -> None:
    """Hive-layout write with a bounded file count per directory.

    ``files_per_partition > 1`` adds a deterministic salt (hash of the
    full row's partition values plus a spread column when present) so
    hot partitions get writer parallelism without unbounded file
    counts."""
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        out = df.repartition(*cols, salt.alias("__salt"))
    else:
        out = df.repartition(*cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted_ranges(df: DataFrame, path: str, key_col: str,
                        n_files: int, mode: str = "overwrite") -> None:
    """Range-partition on ``key_col`` and sort within each file: files
    carry non-overlapping key ranges, so any engine reading the parquet
    min/max stats skips files on key predicates."""
    (df.repartitionByRange(n_files, F.col(key_col))
     .sortWithinPartitions(key_col)
     .write.mode(mode).parquet(path))


def _morton_interleave(a, b, bits: int = 21):
    """Interleave the low ``bits`` bits of two non-negative bigint
    columns into a Z-order (Morton) key — pure codegen expressions
    (shift/mask/or), no UDF.  21+21 bits fits a bigint."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        # Column `|` is logical OR in PySpark; bitwiseOR is the bit op.
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a, i) % 2, 2 * i)).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(b, i) % 2, 2 * i + 1))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int, bits: int = 21,
                   mode: str = "overwrite") -> None:
    """Two-dimensional clustering: range-partition + sort on the Morton
    interleave of two key columns, so parquet min/max stats on BOTH
    columns stay tight per file and predicates on EITHER column skip
    files — the classic Z-order layout (Delta OPTIMIZE ZORDER shape)
    without needing a table format.  Columns must be non-negative
    integers (rank/bucketize first otherwise)."""
    z = _morton_interleave(F.col(col_a).cast("bigint"),
                           F.col(col_b).cast("bigint"), bits)
    (df.withColumn("__z", z)
     .repartitionByRange(n_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))
