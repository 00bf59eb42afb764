"""Interchange-format round-trip queries (r8 verdict item 6): each
write→read-back pair runs the real sink and source from
sources/jsonl.py / sources/formats.py over the documents table and
must hash-match the plain parquet oracle — making the format wrappers
check_oracle-visible (they were pytest-only) and driver-promotable.

The round-trip is executed for real on every run (the table is small
at test sf; at 100 TB these wrappers are one distributed write + one
scan — nothing here collects).  Writes land under the repo-local
``.scratch`` directory like the streaming stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from graphraft_spark.registry import register

_DOCS_ORACLE = "SELECT doc_id, text, lang, source, n_chars FROM documents"
_DOCS_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _scratch(sf_dir: str, fmt: str) -> str:
    # The path carries the PID so two harness processes running the
    # same query on the same sf concurrently write disjoint directories
    # instead of racing (one overwriting while the other reads back).
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    tag = os.path.basename(sf_dir.rstrip("/"))
    return f"{repo}/.scratch/io_{fmt}_{tag}_{os.getpid()}"


def _docs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select(*_DOCS_COLS)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields)
    return df, ddl


@register("io_jsonl_roundtrip", oracle=_DOCS_ORACLE)
def io_jsonl_roundtrip(spark, sf_dir):
    """documents → plain-text JSONL (sources/jsonl.py write_jsonl;
    compression=None — the zstd default needs native Hadoop codecs this
    sandbox JVM lacks) → explicit-schema DROPMALFORMED read
    (read_jsonl) — must equal the parquet scan under the driver's
    value hash."""
    from graphraft_spark.sources.jsonl import read_jsonl, write_jsonl

    df, ddl = _docs(spark, sf_dir)
    path = _scratch(sf_dir, "jsonl")
    write_jsonl(df, path, compression=None)
    return read_jsonl(spark, path, ddl).select(*_DOCS_COLS)


@register("io_csv_roundtrip", oracle=_DOCS_ORACLE)  # promoted r10
def io_csv_roundtrip(spark, sf_dir):
    """documents → headered CSV (sources/formats.py write_csv) →
    explicit-schema DROPMALFORMED read (read_csv) — the inference-free
    one-scan contract, hash-matched against the parquet oracle.
    read_csv's multiLine default keeps the round-trip lossless even if
    a future corpus embeds newlines inside quoted text fields."""
    from graphraft_spark.sources.formats import read_csv, write_csv

    df, ddl = _docs(spark, sf_dir)
    path = _scratch(sf_dir, "csv")
    write_csv(df, path)
    return read_csv(spark, path, ddl).select(*_DOCS_COLS)


@register("io_orc_roundtrip", oracle=_DOCS_ORACLE)  # promoted r10
def io_orc_roundtrip(spark, sf_dir):
    """documents → ORC (sources/formats.py write_orc) → ORC scan
    (read_orc; schema travels with the file) — hash-matched against
    the parquet oracle."""
    from graphraft_spark.sources.formats import read_orc, write_orc

    df, ddl = _docs(spark, sf_dir)
    path = _scratch(sf_dir, "orc")
    write_orc(df, path)
    return read_orc(spark, path).select(*_DOCS_COLS)
