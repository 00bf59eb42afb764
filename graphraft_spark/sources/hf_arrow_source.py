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

    def writer(self, schema, overwrite: bool) -> "HFArrowWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("hfarrow requires .option('path', <split dir>)")
        if not overwrite:
            # append would have to merge pre-existing data-*.arrow shards
            # into the rename + state.json bookkeeping; until that is
            # implemented, a non-overwrite save would silently drop (or
            # os.replace-clobber) existing shards — refuse instead.
            raise ValueError(
                "hfarrow supports mode='overwrite' only; append/ignore "
                "would corrupt an existing save_to_disk split")
        return HFArrowWriter(path, schema, overwrite)


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
    data/hf_arrow.py:read_hf_split (same rows, shard-parallel scan).

    NOTE: enables ``spark.sql.python.filterPushdown.enabled`` on the
    session (ships default-off; runtime-settable).  The flag only
    affects Python data sources — it lets ``pushFilters`` receive
    Catalyst predicates — and pushed filters are exact-by-construction
    (unsupported ones are handed back), so leaving it on session-wide
    is semantics-preserving for every other query."""
    spark.dataSource.register(HFArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark.read.format("hfarrow").option("path", split_dir).load()


# --- writer: executor-parallel save_to_disk layout ------------------------

from dataclasses import dataclass as _dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    WriterCommitMessage,
)


@_dataclass
class _WrittenFile(WriterCommitMessage):
    filename: str | None


def _hf_feature(dt):
    """Spark type → HF `features` entry (Value / Sequence-of-Value).
    Returns None for types the HF features JSON can't describe this
    simply — dataset_info.json is then omitted (the data files and
    state.json, which our readers use, are always written)."""
    from pyspark.sql import types as T

    atomic = {
        T.LongType: "int64", T.IntegerType: "int32",
        T.DoubleType: "float64", T.FloatType: "float32",
        T.StringType: "string", T.BooleanType: "bool",
        T.TimestampNTZType: "timestamp[us]",
        T.TimestampType: "timestamp[us]",
    }
    if type(dt) in atomic:
        return {"dtype": atomic[type(dt)], "_type": "Value"}
    if isinstance(dt, T.ArrayType):
        inner = _hf_feature(dt.elementType)
        if inner is not None:
            return {"feature": inner, "_type": "Sequence"}
    return None


class HFArrowWriter(DataSourceArrowWriter):
    """One `data-IIIII-of-NNNNN.arrow` IPC stream per non-empty task,
    staged under temp names and renamed in the driver-side commit —
    write tasks are speculatable/retryable because only committed
    messages get renamed; aborted attempts leave tmp files that the
    next overwrite clears."""

    def __init__(self, path: str, schema, overwrite: bool) -> None:
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator):
        import json
        import uuid

        # `datasets` embeds its features spec as the shard schema's
        # 'huggingface' metadata (golden: mag-data/qa/valid shard);
        # mirror it whenever the features are HF-expressible so an
        # engine-written shard is metadata-identical to a
        # save_to_disk one.
        feats = {f.name: _hf_feature(f.dataType) for f in self.schema.fields}
        md = (None if any(v is None for v in feats.values())
              else {"huggingface": json.dumps({"info": {"features": feats}})})

        writer = sink = fname = None
        for batch in iterator:
            if writer is None:
                fname = f"tmp-{uuid.uuid4().hex}.arrow"
                sink = pa.OSFile(os.path.join(self.path, fname), "wb")
                schema = (batch.schema.with_metadata(md)
                          if md else batch.schema)
                writer = pa.ipc.new_stream(sink, schema)
            writer.write_batch(batch)
        if writer is not None:
            writer.close()
            sink.close()
        return _WrittenFile(fname)

    def commit(self, messages):
        import hashlib
        import json

        files = sorted(m.filename for m in messages
                       if m is not None and m.filename)
        if self.overwrite:
            mine = set(files)
            for e in os.listdir(self.path):
                stale_tmp = (e.startswith("tmp-") and e.endswith(".arrow")
                             and e not in mine)  # aborted former attempts
                if stale_tmp \
                        or (e.startswith("data-") and e.endswith(".arrow")) \
                        or e in ("state.json", "dataset_info.json"):
                    os.remove(os.path.join(self.path, e))
        total = len(files)
        final = []
        for i, f in enumerate(files):
            name = f"data-{i:05d}-of-{total:05d}.arrow"
            os.replace(os.path.join(self.path, f),
                       os.path.join(self.path, name))
            final.append(name)
        state = {
            "_data_files": [{"filename": f} for f in final],
            "_fingerprint": hashlib.md5(
                ";".join(final).encode()).hexdigest()[:16],
            "_format_columns": None,
            "_format_kwargs": {},
            "_format_type": None,
            "_output_all_columns": False,
            "_split": None,
        }
        with open(os.path.join(self.path, "state.json"), "w") as fh:
            json.dump(state, fh, indent=2)
        feats = {f.name: _hf_feature(f.dataType) for f in self.schema.fields}
        if all(v is not None for v in feats.values()):
            info = {"citation": "", "description": "", "features": feats,
                    "homepage": "", "license": ""}
            with open(os.path.join(self.path, "dataset_info.json"),
                      "w") as fh:
                json.dump(info, fh, indent=2)

    def abort(self, messages):
        for m in messages or []:
            if m is not None and m.filename:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def write_hf_split_distributed(df, split_dir: str,
                               mode: str = "overwrite") -> None:
    """Executor-parallel writer twin of ``read_hf_split_distributed``:
    saves a DataFrame as an HF save_to_disk split (data shards +
    state.json; dataset_info.json when the schema maps to HF
    Value/Sequence features)."""
    spark = df.sparkSession
    spark.dataSource.register(HFArrowDataSource)
    df.write.format("hfarrow").option("path", split_dir).mode(mode).save()


def write_hf_dataset_distributed(splits: "dict[str, object]",
                                 dataset_dir: str,
                                 mode: str = "overwrite") -> None:
    """dataset_dict-level writer: one split directory per entry plus the
    top-level dataset_dict.json (exact layout of the reference's
    mag-data/qa artifacts: {"splits": [...]} with insertion order
    preserved).  The inverse of data/hf_arrow.py:read_hf_dataset."""
    import json

    os.makedirs(dataset_dir, exist_ok=True)
    for name, df in splits.items():
        write_hf_split_distributed(df, os.path.join(dataset_dir, name),
                                   mode=mode)
    with open(os.path.join(dataset_dir, "dataset_dict.json"), "w") as fh:
        json.dump({"splits": list(splits)}, fh)
