"""GraphFrames-style motif interface (SURVEY §7 M7 interop).

``find(graph, "(a:Customer {name: 'X'})-[:PLACED]-(b:Order)-[:CONTAINS]-(c)")``
parses a chain motif into the pattern IR and returns one column set per
motif variable (``a_nodeId, a_label, a_name, ...``) — the familiar
GraphFrames surface over the same compiler (undirected semantics, exact
relationship uniqueness).  ``to_graphframes`` exports the
(vertices, edges) frames with GraphFrames/GraphX column naming for
direct interop with those libraries when they are on the classpath.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphraft_spark.graph.model import PropertyGraph
from graphraft_spark.patterns.compiler import compile_pattern
from graphraft_spark.patterns.ir import NodeSpec, PatternSpec

_NODE = re.compile(
    r"\(\s*(?P<var>\w+)?\s*(?::(?P<label>\w+))?"
    r"(?:\s*\{\s*name\s*:\s*'(?P<name>[^']*)'\s*\})?\s*\)")
_REL = re.compile(r"-\[\s*(?:\w+)?\s*(?::(?P<type>\w+))?\s*\]-")


def parse_motif(motif: str) -> tuple[PatternSpec, list[str]]:
    """Parse a chain motif string → (PatternSpec, variable names).
    Anonymous nodes get positional names x1..xN."""
    pos = 0
    nodes: list[NodeSpec] = []
    names: list[str] = []
    rels: list[str | None] = []
    m = _NODE.match(motif, pos)
    if not m:
        raise ValueError(f"motif must start with a node: {motif!r}")
    while m:
        nodes.append(NodeSpec(label=m.group("label"), name=m.group("name")))
        names.append(m.group("var") or f"x{len(nodes)}")
        pos = m.end()
        if pos >= len(motif.rstrip()):
            break
        r = _REL.match(motif, pos)
        if not r:
            raise ValueError(f"expected -[..]- at offset {pos}: {motif!r}")
        rels.append(r.group("type"))
        pos = r.end()
        m = _NODE.match(motif, pos)
        if not m:
            raise ValueError(f"expected a node at offset {pos}: {motif!r}")
    if len(names) != len(set(names)):
        raise ValueError("motif variables must be distinct")
    spec = PatternSpec(nodes=tuple(nodes), rels=tuple(rels), return_index=0)
    return spec, names


def find(graph: PropertyGraph, motif: str) -> DataFrame:
    """All bindings of a chain motif, columns named per motif variable."""
    spec, names = parse_motif(motif)
    df = compile_pattern(graph, spec)
    renames = []
    for i, var in enumerate(names):
        for attr in ("nodeId", "label", "name"):
            renames.append(F.col(f"x{i + 1}_{attr}").alias(f"{var}_{attr}"))
    for j in range(len(spec.rels)):
        renames.append(F.col(f"r{j + 1}_relType").alias(f"e{j + 1}_relType"))
        renames.append(F.col(f"r{j + 1}_edgeId").alias(f"e{j + 1}_edgeId"))
    return df.select(*renames)


def to_graphframes(graph: PropertyGraph) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) with GraphFrames naming: vertices(id, ...),
    edges(src, dst, relationship).  Feed to graphframes.GraphFrame or
    GraphX via the standard constructors."""
    v = graph.nodes.withColumnRenamed("nodeId", "id")
    e = graph.edges.select("src", "dst",
                           F.col("relType").alias("relationship"))
    return v, e
