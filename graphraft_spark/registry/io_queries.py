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
from graphraft_spark.sources.pq_cache import load_pq

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
    df = load_pq(spark, f"{sf_dir}/documents.parquet") \
        .select(*_DOCS_COLS)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields)
    return df, ddl


@register("io_jsonl_roundtrip", oracle=_DOCS_ORACLE,
          extra=True)  # demoted r13 (eighth wave)
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


@register("io_csv_roundtrip", oracle=_DOCS_ORACLE,
          extra=True)  # demoted r12 (green r10-r11; io keeps jsonl+bucketed)
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


@register("io_orc_roundtrip", oracle=_DOCS_ORACLE,
          extra=True)  # demoted r12 (green r10-r11)
def io_orc_roundtrip(spark, sf_dir):
    """documents → ORC (sources/formats.py write_orc) → ORC scan
    (read_orc; schema travels with the file) — hash-matched against
    the parquet oracle."""
    from graphraft_spark.sources.formats import read_orc, write_orc

    df, ddl = _docs(spark, sf_dir)
    path = _scratch(sf_dir, "orc")
    write_orc(df, path)
    return read_orc(spark, path).select(*_DOCS_COLS)


_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register("io_bucketed_join", oracle=_BUCKETED_ORACLE)  # promoted r12
def io_bucketed_join(spark, sf_dir):
    """Co-located join through bucketed tables (sources/bucketed.py):
    orders and lineitem are written bucketed+sorted on the order key
    (same bucket count both sides), read back through the catalog, and
    merge-joined — the join inputs carry NO Exchange (asserted by
    tests/test_bucketed.py over this exact plan); the only shuffle
    left is the post-join re-key onto o_orderpriority.  At 100 TB this
    is the difference between shuffling the fact table once at WRITE
    time and re-shuffling it on every downstream join.  The merge hint
    keeps the demonstration honest at test sf where AQE would broadcast
    the small side (broadcast needs no co-location to skip exchanges)."""
    from pyspark.sql import functions as F

    from graphraft_spark.sources.bucketed import (
        read_bucketed_table,
        write_bucketed_table,
    )

    # catalog hygiene: prior invocations (other sf dirs / pids in a
    # long-lived driver session) leave their external tables registered
    # — drop every io_bucketed_* entry before creating this run's pair
    # (r11 advice; the CURRENT run's tables must outlive the returned
    # plan, so cleanup can only happen here, at the NEXT invocation).
    for t in spark.catalog.listTables():
        if t.name.startswith("io_bucketed_"):
            spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")
    base = _scratch(sf_dir, "bucketed")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    names = {}
    for src, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"io_bucketed_{src}_{tag}_{os.getpid()}"
        df = load_pq(spark, f"{sf_dir}/{src}.parquet")
        write_bucketed_table(df, name, f"{base}/{src}", key, n_buckets=8)
        names[src] = name
    o = read_bucketed_table(spark, names["orders"])
    li = read_bucketed_table(spark, names["lineitem"])
    disc = F.col("l_extendedprice").cast("decimal(18,4)") \
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
    return (li.hint("merge")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum(disc).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))
