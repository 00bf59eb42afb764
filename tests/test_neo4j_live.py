"""Live-Neo4j bridge (sources/neo4j_live.py): no server exists in this
environment, so the tests pin everything short of .load() — the option
plumbing and, mainly, that connector-shaped frames convert to the SAME
PropertyGraph contract the offline CSV bridge produces (the two ingest
paths must be interchangeable downstream)."""

import pytest
from pyspark.sql import functions as F

from graphraft_spark.sources.neo4j_live import (
    CONNECTOR_FORMAT,
    connector_nodes_options,
    connector_rels_options,
    frames_to_property_graph,
    jdbc_options,
)

NODE_SCHEMA = ("`<id>` bigint, `<labels>` array<string>, nodeId bigint,"
               " name string")
REL_SCHEMA = ("`<rel.id>` bigint, `<rel.type>` string,"
              " `<source.id>` bigint, `<target.id>` bigint,"
              " `rel.weight` double")


def _connector_frames(spark):
    # internal ids (100x) deliberately differ from the reference's
    # nodeId property so the endpoint remap is exercised
    nodes = spark.createDataFrame(
        [(100, ["Paper", "_Entity_"], 1, "P-alpha"),
         (101, ["Author", "_Entity_"], 2, "Ada"),
         (102, ["Paper", "_Entity_"], 3, "P-beta")],
        NODE_SCHEMA)
    rels = spark.createDataFrame(
        [(7, "WRITES", 101, 100, 0.5),
         (8, "CITES", 100, 102, 1.0)],
        REL_SCHEMA)
    return nodes, rels


def test_frames_to_property_graph_contract(spark, tmp_path):
    """The live path's PropertyGraph must match the CSV bridge's schema
    contract exactly, and endpoints must be remapped from Neo4j
    internal ids to the reference's nodeId property."""
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv

    nodes_df, rels_df = _connector_frames(spark)
    g = frames_to_property_graph(nodes_df, rels_df)

    # equivalent offline export of the same graph
    np_, rp = str(tmp_path / "nodes"), str(tmp_path / "rels")
    spark.createDataFrame(
        [("1", "Paper;_Entity_", "P-alpha"),
         ("2", "Author;_Entity_", "Ada"),
         ("3", "Paper;_Entity_", "P-beta")],
        "`nodeId:ID` string, `:LABEL` string, name string") \
        .write.option("header", True).csv(np_)
    spark.createDataFrame(
        [("2", "1", "WRITES"), ("1", "3", "CITES")],
        "`:START_ID` string, `:END_ID` string, `:TYPE` string") \
        .write.option("header", True).csv(rp)
    g_csv = read_neo4j_csv(spark, np_, rp)

    def shape(df, cols):
        return [(f.name, f.dataType) for f in df.select(*cols).schema.fields]

    assert (shape(g.nodes, ["nodeId", "label", "name"])
            == shape(g_csv.nodes, ["nodeId", "label", "name"]))
    assert (shape(g.edges, ["edgeId", "src", "dst", "relType"])
            == shape(g_csv.edges, ["edgeId", "src", "dst", "relType"]))

    got_nodes = {(r["nodeId"], r["label"], r["name"])
                 for r in g.nodes.collect()}
    assert got_nodes == {(1, "Paper", "P-alpha"), (2, "Author", "Ada"),
                         (3, "Paper", "P-beta")}
    got_edges = {(r["src"], r["dst"], r["relType"])
                 for r in g.edges.collect()}
    assert got_edges == {(2, 1, "WRITES"), (1, 3, "CITES")}
    assert got_edges == {(r["src"], r["dst"], r["relType"])
                         for r in g_csv.edges.collect()}
    # relationship properties survive with the rel. prefix stripped
    assert {r["weight"] for r in g.edges.collect()} == {0.5, 1.0}


def test_internal_id_fallback(spark):
    """Nodes without the reference's nodeId property key on Neo4j's
    internal <id>; no remap applies."""
    nodes = spark.createDataFrame(
        [(100, ["Paper"], "P-alpha"), (101, ["Author"], "Ada")],
        "`<id>` bigint, `<labels>` array<string>, name string")
    rels = spark.createDataFrame(
        [(7, "WRITES", 101, 100, 1.0)], REL_SCHEMA)
    g = frames_to_property_graph(nodes, rels)
    assert {r["nodeId"] for r in g.nodes.collect()} == {100, 101}
    assert [(r["src"], r["dst"]) for r in g.edges.collect()] == [(101, 100)]


def test_validate_catches_dangling_live_edges(spark):
    nodes = spark.createDataFrame(
        [(100, ["Paper"], 1, "P-alpha")], NODE_SCHEMA)
    rels = spark.createDataFrame(
        [(7, "CITES", 100, 999, 1.0)], REL_SCHEMA)
    with pytest.raises(ValueError, match="endpoint"):
        frames_to_property_graph(nodes, rels)


def test_option_builders():
    n = connector_nodes_options("bolt://h:7687", labels=":Paper",
                                username="u", password="p", partitions=64)
    assert n["url"] == "bolt://h:7687" and n["labels"] == ":Paper"
    assert n["partitions"] == "64"
    assert n["authentication.basic.username"] == "u"
    r = connector_rels_options("bolt://h:7687", relationship="CITES")
    assert r["relationship.nodes.map"] == "false"
    assert "authentication.type" not in r
    j = jdbc_options("jdbc:neo4j:bolt://h:7687", "MATCH (n) RETURN n")
    assert j["driver"] == "org.neo4j.jdbc.Neo4jDriver"
    assert j["query"].startswith("MATCH")
    assert CONNECTOR_FORMAT == "org.neo4j.spark.DataSource"


def test_reader_builds_without_jar(spark):
    """Everything short of .load() must work in a jar-less environment —
    the documented MIGRATION snippet fails only at the network call."""
    reader = spark.read.format(CONNECTOR_FORMAT).options(
        **connector_nodes_options("bolt://localhost:7687"))
    assert reader is not None
