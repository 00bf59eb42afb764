"""Driver-contract registry: named (spark_query, oracle_sql) pairs.

Every implemented operator from SURVEY.md §2 registers a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
ANSI-SQL oracle string DuckDB runs on the same parquet views.  Column
names are aliased identically on both sides — the driver sorts columns
by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Confs the queries' semantics depend on; the DRIVER may hand us a
# session built without graphraft_spark.session defaults, so every
# registered query re-asserts them (all runtime-settable SQL confs).
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every query module (registration side effects)."""
    from graphraft_spark.registry import (  # noqa: F401
        graph_queries,
        search_queries,
        retrieval_queries,
        dataset_queries,
        metrics_queries,
        dedup_queries,
        similarity_queries,
        textanalysis_queries,
        streaming_queries,
        temporal_queries,
        multimodal_queries,
        llm_queries,
        tpch_queries,
    )
