"""Executor-parallel reader for HuggingFace-`datasets` on-disk Arrow
splits, as a PySpark 4 Python Data Source.

data/hf_arrow.py reads a split driver-side (pyarrow → createDataFrame)
— right for thousand-row QA tables, wrong for sharded corpora: the
whole dataset funnels through the driver.  This source instead maps
ONE SPARK PARTITION PER .arrow SHARD and yields pyarrow RecordBatches
straight from each executor's memory-mapped file — no driver
materialization, no row-by-row conversion (Arrow batches cross into
the JVM via the same vectorized path parquet uses).

Scan-level optimizations, mirroring what a native file source gives:

- **column pruning**: Spark hands ``reader(schema)`` the pruned
  schema; each batch is projected to exactly those columns before
  crossing to the JVM.
- **filter pushdown**: simple comparisons/IsNull on top-level columns
  are accepted from Catalyst and evaluated per-batch with
  pyarrow.compute before the batch is yielded; everything else is
  handed back to Spark (returning the unsupported remainder from
  ``pushFilters`` keeps semantics exact by construction).

Usage::

    spark.dataSource.register(HFArrowDataSource)
    df = (spark.read.format("hfarrow")
          .option("path", ".../qa_with_cypher_queries/valid").load())

Cited reference surface: llm1.py:119 / llm2.py:135 (load_from_disk of
save_to_disk layouts: split dirs holding data-*-of-*.arrow IPC stream
files).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.pandas.types import from_arrow_schema


def _split_files(path: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(path, "data-*.arrow")))
    if not files:
        raise FileNotFoundError(f"no data-*.arrow under {path}")
    return files


def _file_schema(f: str) -> pa.Schema:
    with pa.memory_map(f) as src:
        return pa.ipc.open_stream(src).schema


@dataclass
class _ShardPartition(InputPartition):
    file: str


class HFArrowDataSource(DataSource):
    """``format("hfarrow")`` — option ``path`` points at one split
    directory of a save_to_disk dataset."""

    @classmethod
    def name(cls) -> str:
        return "hfarrow"

    def schema(self):
        # Driver touches METADATA only: the first shard's IPC schema.
        path = self.options.get("path")
        if not path:
            raise ValueError("hfarrow requires .option('path', <split dir>)")
        return from_arrow_schema(_file_schema(_split_files(path)[0]))

    def reader(self, schema) -> "HFArrowReader":
        return HFArrowReader(self.options["path"], schema)


# Catalyst filter → (column, op) evaluable with pyarrow.compute.
_SIMPLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
           LessThanOrEqual, IsNull, IsNotNull)


class HFArrowReader(DataSourceReader):
    def __init__(self, path: str, schema) -> None:
        self.path = path
        self.columns = [f.name for f in schema.fields]
        self.filters: list = []

    def pushFilters(self, filters):
        """Accept simple single-column predicates on TOP-LEVEL columns;
        everything else (nested paths, Not/In/string matches, compound
        trees) is returned to Spark to evaluate post-scan."""
        unsupported = []
        for f in filters:
            if isinstance(f, _SIMPLE) and len(f.attribute) == 1:
                self.filters.append(f)
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        return [_ShardPartition(f) for f in _split_files(self.path)]

    def _mask(self, batch: pa.RecordBatch):
        import pyarrow.compute as pc

        mask = None
        for f in self.filters:
            col = batch.column(batch.schema.get_field_index(f.attribute[0]))
            if isinstance(f, IsNull):
                m = pc.is_null(col)
            elif isinstance(f, IsNotNull):
                m = pc.is_valid(col)
            else:
                val = pa.scalar(f.value)
                op = {EqualTo: pc.equal, GreaterThan: pc.greater,
                      GreaterThanOrEqual: pc.greater_equal,
                      LessThan: pc.less,
                      LessThanOrEqual: pc.less_equal}[type(f)]
                # comparisons with NULL are NULL → treat as filtered-out
                m = pc.fill_null(op(col, val), False)
            mask = m if mask is None else pc.and_(mask, m)
        return mask

    def read(self, partition: _ShardPartition):
        with pa.memory_map(partition.file) as src:
            for batch in pa.ipc.open_stream(src):
                if self.filters:
                    mask = self._mask(batch)
                    batch = batch.filter(mask)
                if batch.num_rows == 0:
                    continue
                yield batch.select(self.columns)


def read_hf_split_distributed(spark, split_dir: str):
    """Register-and-read convenience: the executor-parallel twin of
    data/hf_arrow.py:read_hf_split (same rows, shard-parallel scan)."""
    spark.dataSource.register(HFArrowDataSource)
    # Python-source filter pushdown ships default-off; runtime-settable.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark.read.format("hfarrow").option("path", split_dir).load()
