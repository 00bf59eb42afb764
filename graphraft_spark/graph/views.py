"""SQL surface: expose the property graph and base tables as temp views
so users can query with ``spark.sql`` instead of (or alongside) the
DataFrame API — the Catalyst plans are identical.

    register_graph_views(spark, graph)
    spark.sql("SELECT ... FROM nodes JOIN undirected_edges ON ...")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphraft_spark.graph.model import PropertyGraph


def register_graph_views(spark: SparkSession, graph: PropertyGraph,
                         prefix: str = "") -> None:
    """Create/replace temp views ``{prefix}nodes``, ``{prefix}edges``,
    ``{prefix}undirected_edges`` over the graph frames."""
    graph.nodes.createOrReplaceTempView(f"{prefix}nodes")
    graph.edges.createOrReplaceTempView(f"{prefix}edges")
    graph.undirected_edges.createOrReplaceTempView(
        f"{prefix}undirected_edges")


def register_table_views(spark: SparkSession, sf_dir: str,
                         names=None) -> None:
    """Create/replace temp views for the base parquet tables — the same
    names the DuckDB oracle uses, so oracle SQL is runnable on Spark
    too (modulo dialect differences)."""
    from graphraft_spark.graph.tpch import TABLES, load_tables

    for name, df in load_tables(spark, sf_dir, names or TABLES).items():
        df.createOrReplaceTempView(name)
