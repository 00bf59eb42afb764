"""HuggingFace-`datasets` interop: read the reference's on-disk Arrow
datasets (save_to_disk layout: split dirs with data-*.arrow IPC-stream
files) into Spark DataFrames — the migration path for a reference user's
existing qa/qa_with_ner/qa_with_cypher_queries artifacts (llm1.py:119,
llm2.py:135 load_from_disk).

Small QA tables (thousands of rows) go driver-side through pyarrow →
Spark; that is the right tool at this scale.  For sharded corpora use
the executor-parallel twin instead —
``graphraft_spark.sources.read_hf_split_distributed`` (a PySpark 4
Python Data Source: one partition per .arrow shard, Arrow-batch
transfer, column pruning + filter pushdown) — or export to parquet
once (``to_parquet``) and read natively.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def read_hf_split(spark: SparkSession, split_dir: str) -> DataFrame:
    """One split directory (contains data-*-of-*.arrow IPC stream files)."""
    files = sorted(glob.glob(os.path.join(split_dir, "data-*.arrow")))
    if not files:
        raise FileNotFoundError(f"no data-*.arrow under {split_dir}")
    tables = []
    for f in files:
        with pa.memory_map(f) as src:
            tables.append(pa.ipc.open_stream(src).read_all())
    table = pa.concat_tables(tables)
    return spark.createDataFrame(table.to_pandas())


def read_hf_dataset(spark: SparkSession, dataset_dir: str) -> dict[str, DataFrame]:
    """A dataset_dict directory → {split_name: DataFrame}."""
    out: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(dataset_dir)):
        sub = os.path.join(dataset_dir, entry)
        if os.path.isdir(sub) and glob.glob(os.path.join(sub, "data-*.arrow")):
            out[entry] = read_hf_split(spark, sub)
    if not out and glob.glob(os.path.join(dataset_dir, "data-*.arrow")):
        out["train"] = read_hf_split(spark, dataset_dir)
    return out
