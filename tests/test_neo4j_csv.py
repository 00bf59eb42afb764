"""Neo4j-admin CSV bridge: header-convention parsing, label reduction,
string-ID mapping, validation, and full graph round-trip."""

import pytest


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_read_numeric_ids_and_multilabel(spark, tmp_path):
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv

    nodes = _write(tmp_path, "nodes.csv",
                   "nodeId:ID,name,:LABEL\n"
                   "1,Ada,Author;_Entity_\n"
                   "2,P-alpha,_Entity_;Paper\n")
    rels = _write(tmp_path, "rels.csv",
                  ":START_ID,:END_ID,:TYPE\n1,2,WRITES\n")
    g = read_neo4j_csv(spark, nodes, rels)
    rows = {r["nodeId"]: r for r in g.nodes.collect()}
    # numeric IDs cast 1:1; _Entity_ dropped whatever its position
    assert rows[1]["label"] == "Author" and rows[1]["name"] == "Ada"
    assert rows[2]["label"] == "Paper"
    e, = g.edges.collect()
    assert (e["src"], e["dst"], e["relType"]) == (1, 2, "WRITES")


def test_read_string_ids_get_deterministic_dense_ids(spark, tmp_path):
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv

    nodes = _write(tmp_path, "nodes.csv",
                   "uid:ID,name,:LABEL\n"
                   "paper-b,B,Paper\npaper-a,A,Paper\nauth-x,X,Author\n")
    rels = _write(tmp_path, "rels.csv",
                  ":START_ID,:END_ID,:TYPE\n"
                  "auth-x,paper-a,WRITES\nauth-x,paper-b,WRITES\n")
    g = read_neo4j_csv(spark, nodes, rels)
    by_name = {r["name"]: r["nodeId"] for r in g.nodes.collect()}
    # dense ids follow sorted raw-id order: auth-x < paper-a < paper-b
    assert (by_name["X"], by_name["A"], by_name["B"]) == (1, 2, 3)
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} \
        == {(1, 2), (1, 3)}
    # deterministic across re-reads
    g2 = read_neo4j_csv(spark, nodes, rels)
    assert {r["name"]: r["nodeId"] for r in g2.nodes.collect()} == by_name


def test_dangling_edge_is_loud_by_default(spark, tmp_path):
    """Unknown endpoint IDs fail the read (neo4j-admin's own default);
    skip_bad_relationships=True drops them instead."""
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv

    nodes = _write(tmp_path, "nodes.csv", "id:ID,name,:LABEL\n1,A,Author\n")
    rels = _write(tmp_path, "rels.csv",
                  ":START_ID,:END_ID,:TYPE\n1,99,WRITES\n")
    with pytest.raises(ValueError, match="unknown node IDs"):
        read_neo4j_csv(spark, nodes, rels)
    g = read_neo4j_csv(spark, nodes, rels, skip_bad_relationships=True)
    assert g.edges.count() == 0


def test_missing_header_columns_raise(spark, tmp_path):
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv

    nodes = _write(tmp_path, "nodes.csv", "id,name,label\n1,A,Author\n")
    rels = _write(tmp_path, "rels.csv",
                  ":START_ID,:END_ID,:TYPE\n1,1,X\n")
    with pytest.raises(ValueError, match=":ID"):
        read_neo4j_csv(spark, nodes, rels)


def test_roundtrip_through_csv(spark, tiny_graph, tmp_path):
    """engine -> neo4j-admin CSV -> engine preserves the graph, and the
    written files carry the documented header conventions."""
    from graphraft_spark.graph.neo4j_csv import read_neo4j_csv, write_neo4j_csv

    np, rp = str(tmp_path / "nodes"), str(tmp_path / "rels")
    write_neo4j_csv(tiny_graph, np, rp)

    header = spark.read.text(np).limit(0)  # files exist
    back = read_neo4j_csv(spark, np, rp)
    want_nodes = {(r["nodeId"], r["label"], r["name"])
                  for r in tiny_graph.nodes.collect()}
    got_nodes = {(r["nodeId"], r["label"], r["name"])
                 for r in back.nodes.collect()}
    assert got_nodes == want_nodes
    want_edges = {(r["src"], r["dst"], r["relType"])
                  for r in tiny_graph.edges.collect()}
    got_edges = {(r["src"], r["dst"], r["relType"])
                 for r in back.edges.collect()}
    assert got_edges == want_edges
    # written node header advertises :ID/:LABEL and the catch-all label
    raw = spark.read.option("header", True).csv(np)
    assert any(c.endswith(":ID") for c in raw.columns)
    assert raw.filter(~F_contains_entity(raw)).count() == 0


def F_contains_entity(df):
    from pyspark.sql import functions as F

    return F.col(":LABEL").contains("_Entity_")
