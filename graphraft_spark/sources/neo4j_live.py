"""Live-Neo4j bridge: read a graph straight off a running server into
a :class:`PropertyGraph`, for reference users whose graph lives in
Neo4j (loaded by stark_neo4j_loading.py:20-80 over bolt) and who can't
or won't take an offline ``neo4j-admin`` CSV export first
(graph/neo4j_csv.py is that offline path).

Two public transport options exist, both configured here:

1. **Neo4j Spark connector** (``org.neo4j.spark.DataSource``, Maven
   ``org.neo4j:neo4j-connector-apache-spark_2.13``) — the production
   path: server-side partitioned reads (the connector splits on
   ``SKIP/LIMIT`` windows or node-id ranges), predicate pushdown into
   Cypher, no driver bottleneck.  ``connector_nodes_options`` /
   ``connector_rels_options`` build the option maps;
   ``frames_to_property_graph`` converts the connector's documented
   output schema (``<id>``, ``<labels>``, ``<rel.type>``,
   ``<source.id>``, ``<target.id>``) into the engine contract.
2. **JDBC** (``jdbc:neo4j:bolt://...`` via the public Neo4j JDBC
   driver) — for shops standardized on spark.read.format("jdbc");
   ``jdbc_options`` builds the option map around a Cypher-as-SQL
   passthrough query.

Neither driver jar ships in this sandbox, so ``.load()`` is the one
call that can't run here; everything up to it — option plumbing and,
crucially, the schema conversion — is real and tested
(tests/test_neo4j_live.py feeds connector-shaped frames and asserts
the exact ``read_neo4j_csv`` PropertyGraph contract comes out).

Scale note: the converters are pure column projections (no shuffle
beyond what validate() does); partitioning is the connector's job
(set ``partitions`` in the option builders to fan the read out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphraft_spark.graph.model import PropertyGraph
from graphraft_spark.graph.neo4j_csv import CATCH_ALL

CONNECTOR_FORMAT = "org.neo4j.spark.DataSource"


def connector_nodes_options(url: str, *, database: str = "neo4j",
                            labels: str = "",
                            username: str | None = None,
                            password: str | None = None,
                            partitions: int | None = None) -> dict[str, str]:
    """Option map for ``spark.read.format(CONNECTOR_FORMAT)`` reading
    nodes (``labels=":Paper"`` or "" for all).  Usage::

        df = (spark.read.format(CONNECTOR_FORMAT)
              .options(**connector_nodes_options("bolt://host:7687",
                                                 labels=":Paper",
                                                 partitions=64))
              .load())
    """
    opts = {"url": url, "database": database, "labels": labels}
    if username is not None:
        opts |= {"authentication.type": "basic",
                 "authentication.basic.username": username,
                 "authentication.basic.password": password or ""}
    if partitions is not None:
        opts["partitions"] = str(partitions)
    return opts


def connector_rels_options(url: str, *, database: str = "neo4j",
                           relationship: str = "",
                           username: str | None = None,
                           password: str | None = None,
                           partitions: int | None = None) -> dict[str, str]:
    """Option map for reading relationships.  ``relationship.nodes.map
    = false`` keeps the output flat (``<source.id>``/``<target.id>``
    columns instead of nested node maps) — the shape
    :func:`frames_to_property_graph` consumes."""
    opts = {"url": url, "database": database,
            "relationship": relationship,
            "relationship.nodes.map": "false",
            "relationship.source.labels": "",
            "relationship.target.labels": ""}
    if username is not None:
        opts |= {"authentication.type": "basic",
                 "authentication.basic.username": username,
                 "authentication.basic.password": password or ""}
    if partitions is not None:
        opts["partitions"] = str(partitions)
    return opts


def jdbc_options(url: str, cypher: str, *,
                 username: str | None = None,
                 password: str | None = None) -> dict[str, str]:
    """Option map for ``spark.read.format("jdbc")`` against the public
    Neo4j JDBC driver (``jdbc:neo4j:bolt://host:7687``) running a
    Cypher passthrough query — the single-connection fallback when the
    Spark connector jar isn't deployable.  Usage::

        df = spark.read.format("jdbc").options(**jdbc_options(
            "jdbc:neo4j:bolt://host:7687",
            "MATCH (n) RETURN n.nodeId AS nodeId, labels(n)[0] AS label",
        )).load()
    """
    opts = {"url": url, "query": cypher,
            "driver": "org.neo4j.jdbc.Neo4jDriver"}
    if username is not None:
        opts |= {"user": username, "password": password or ""}
    return opts


def _strip_rel_prefix(c: str) -> str:
    return c[len("rel."):] if c.startswith("rel.") else c


def connector_nodes_to_raw(df: DataFrame,
                           node_id_prop: str = "nodeId") -> DataFrame:
    """Connector node frame → engine node contract
    (nodeId BIGINT, label STRING, <props...>).

    ``node_id_prop``: the reference stores its own integer ``nodeId``
    property on every node (stark_neo4j_loading.py:39-44) — prefer it
    when present so ids match the reference's embeddings/answers;
    otherwise fall back to Neo4j's internal ``<id>`` (stable within a
    store, not across dump/load cycles).  The catch-all ``_Entity_``
    label is dropped, as on the CSV path."""
    cols = df.columns
    id_src = node_id_prop if node_id_prop in cols else "`<id>`"
    labels = F.array_remove(F.col("`<labels>`"), CATCH_ALL)
    prop_cols = [c for c in cols
                 if c not in ("<id>", "<labels>", node_id_prop)]
    return df.select(
        F.col(id_src).cast("bigint").alias("nodeId"),
        F.element_at(F.array_sort(labels), 1).alias("label"),
        *[F.col(f"`{c}`") for c in prop_cols])


def connector_rels_to_raw(df: DataFrame,
                          id_map: DataFrame | None = None) -> DataFrame:
    """Connector relationship frame (flat, nodes.map=false) → engine
    edge contract (edgeId BIGINT, src BIGINT, dst BIGINT,
    relType STRING, <rel props...>).

    ``id_map``: (internal_id, nodeId) remap when nodes were keyed by a
    ``nodeId`` property rather than Neo4j's internal id — the
    connector's ``<source.id>``/``<target.id>`` are ALWAYS internal
    ids, so the remap keeps endpoints consistent with
    :func:`connector_nodes_to_raw`'s output."""
    prop_cols = [c for c in df.columns if c.startswith("rel.")]
    out = df.select(
        F.col("`<rel.id>`").cast("bigint").alias("edgeId"),
        F.col("`<source.id>`").cast("bigint").alias("src"),
        F.col("`<target.id>`").cast("bigint").alias("dst"),
        F.col("`<rel.type>`").alias("relType"),
        *[F.col(f"`{c}`").alias(_strip_rel_prefix(c)) for c in prop_cols])
    if id_map is not None:
        # LEFT joins: an endpoint missing from the node frame maps to
        # null and is surfaced by PropertyGraph.validate(), never
        # silently dropped
        s = id_map.select(F.col("internal_id").alias("src"),
                          F.col("nodeId").alias("_s"))
        d = id_map.select(F.col("internal_id").alias("dst"),
                          F.col("nodeId").alias("_d"))
        out = (out.join(s, "src", "left").join(d, "dst", "left")
               .select("edgeId", F.col("_s").alias("src"),
                       F.col("_d").alias("dst"), "relType",
                       *[_strip_rel_prefix(c) for c in prop_cols]))
    return out


def frames_to_property_graph(nodes_df: DataFrame, rels_df: DataFrame,
                             node_id_prop: str = "nodeId",
                             validate: bool = True) -> PropertyGraph:
    """Connector-shaped node + relationship frames → validated
    PropertyGraph (the same contract ``read_neo4j_csv`` produces).

    When nodes are keyed by a ``nodeId`` property the relationship
    endpoints (internal ids) are remapped through the
    (internal id → nodeId) pairs carried by the node frame."""
    id_map = None
    if node_id_prop in nodes_df.columns:
        id_map = nodes_df.select(
            F.col("`<id>`").cast("bigint").alias("internal_id"),
            F.col(node_id_prop).cast("bigint").alias("nodeId"))
    nodes = connector_nodes_to_raw(nodes_df, node_id_prop)
    edges = connector_rels_to_raw(rels_df, id_map)
    graph = PropertyGraph(nodes=nodes, edges=edges)
    if validate:
        graph.validate()
    return graph
