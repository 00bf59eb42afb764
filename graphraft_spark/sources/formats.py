"""CSV and ORC source/sink wrappers — the remaining interchange
formats next to Parquet (native), HF-Arrow (hf_arrow_source) and JSONL
(jsonl).  Thin by design: Spark's readers are already correct; what
these add is the SCALE CONTRACT the jsonl module established:

* **Schema is explicit, never inferred** — CSV inference is a full
  extra pass over the data (at 100 TB, a second read of the corpus).
* **Malformed rows are dropped in the parser** (DROPMALFORMED, one
  scan), or fail loudly with ``strict=True`` — never silently
  null-padded into the corpus.
* **Writes stay splittable** — no gzip (one reader per file); CSV
  defaults to no compression for interchange, ORC to its internal
  zlib-striped layout (always splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True, sep: str = ",",
             strict: bool = False, multi_line: bool = True) -> DataFrame:
    """Read CSV with an EXPLICIT schema; malformed lines dropped
    (or FAILFAST under ``strict``).

    ``multi_line=True`` (default) parses quoted fields containing
    embedded newlines correctly — without it, a text column whose value
    spans lines is split mid-record and silently DROPMALFORMED'd on
    read-back (data loss that surfaces only as a row-count drift).  The
    cost: multiLine files are not line-splittable, so each FILE becomes
    one read task — acceptable because the write side emits one file
    per partition anyway (parallelism = file count).  For newline-free
    corpora where per-file splitting matters, pass ``multi_line=False``.
    Quote/escape stay at Spark's defaults, which match the writer's."""
    return (spark.read
            .option("header", header)
            .option("sep", sep)
            .option("multiLine", multi_line)
            .option("mode", "FAILFAST" if strict else "DROPMALFORMED")
            .schema(schema)
            .csv(path))


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, sep: str = ",",
              partition_by: tuple[str, ...] = ()) -> None:
    w = (df.write.mode(mode)
         .option("header", header).option("sep", sep))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar with predicate pushdown + column pruning
    like Parquet (schema travels with the file; nothing to declare)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
