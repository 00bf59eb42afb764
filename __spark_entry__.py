"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).  Implementations live in
``graphraft_spark/``; this file only adapts the registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from graphraft_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full candidate-path
    enumeration (1hop + 2hop + 2path) with grouped distinct-target
    counts — the reference's core retrieval operator
    (path_retriever.py:49-64) over the TPC-H-derived property graph."""
    from graphraft_spark.graph import tpch_graph
    from graphraft_spark.patterns import enumerate_paths

    registry.ensure_confs(spark)  # driver sessions may lack our defaults
    g = tpch_graph(spark, "/root/testdata/sf0.001")
    return enumerate_paths(
        g, ["small ring", "NATION_7", "Customer#000000042"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
