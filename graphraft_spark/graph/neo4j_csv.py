"""Neo4j offline interchange: the public ``neo4j-admin database
import/export`` CSV format, read into / written from a PropertyGraph.

The reference loads its graph INTO a live Neo4j over bolt
(stark_neo4j_loading.py:20-80); a reference user migrating to this
engine holds their graph in Neo4j and has no bolt driver here.  The
standard offline bridge is Neo4j's bulk CSV format (documented header
conventions): node files carry ``<prop>:ID`` and ``:LABEL`` columns,
relationship files carry ``:START_ID`` / ``:END_ID`` / ``:TYPE``;
multi-label cells are ``;``-separated.  ``read_neo4j_csv`` ingests
that layout; ``write_neo4j_csv`` produces it, so graphs round-trip in
both directions (engine → neo4j-admin import, neo4j export → engine).

ID mapping: Neo4j CSV IDs are arbitrary strings in an ID space; our
model keys nodes by BIGINT ``nodeId``.  All-numeric ID columns cast
directly (the common case — the reference's nodeIds are ints).
Otherwise a deterministic dense id is assigned by sorted order through
a two-phase distributed rank (range-partition, rank within range, add
broadcast prefix offsets) — one ingest-time range shuffle, no global
window; the seam for alternative schemes (e.g. xxhash64 + collision
audit) is ``_id_map``.

The catch-all ``_Entity_`` label is dropped on read (the reference
treats it as "the whole nodes frame", path_retriever.py:31) and added
back on write for parity with stark_neo4j_loading.py's labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphraft_spark.graph.model import PropertyGraph

CATCH_ALL = "_Entity_"


def _find(cols: list[str], suffix: str) -> str:
    hits = [c for c in cols if c.endswith(suffix)]
    if len(hits) != 1:
        raise ValueError(f"expected exactly one {suffix!r} column, "
                         f"got {hits or cols}")
    return hits[0]


def _prop_name(col: str) -> str:
    return col.split(":", 1)[0]


def _single_label(label_col) -> "F.Column":
    """';'-separated multi-label cell → the one non-catch-all label
    (labels(n) - {'_Entity_'} reduction, path_retriever.py:31)."""
    labels = F.array_remove(F.split(label_col, ";"), CATCH_ALL)
    return F.element_at(F.array_sort(labels), 1)


def _id_map(ids: DataFrame, num_ranges: int = 32) -> DataFrame:
    """(raw_id string) → (raw_id, nodeId bigint), deterministic.

    Numeric ID spaces cast 1:1; string spaces get dense ids by sorted
    order via the two-phase distributed rank: range-partition on the
    id, rank WITHIN each range, then add the broadcast prefix-sum of
    earlier ranges' counts.  Rank-within-range + offset equals the
    global rank wherever the sampled range boundaries land (ids are
    distinct), so the result is deterministic and no single partition
    ever holds the whole id space — unlike a global row_number window.
    """
    non_numeric = ids.filter(
        F.col("raw_id").try_cast("bigint").isNull()
        & F.col("raw_id").isNotNull())
    if non_numeric.limit(1).count() == 0:
        return ids.select("raw_id",
                          F.col("raw_id").cast("bigint").alias("nodeId"))
    parts = (ids.repartitionByRange(num_ranges, "raw_id")
             .withColumn("_pid", F.spark_partition_id()))
    # offsets frame is num_ranges rows — the global window is bounded
    off_w = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (parts.groupBy("_pid").agg(F.count("*").alias("_n"))
               .withColumn("_off", F.coalesce(F.sum("_n").over(off_w),
                                              F.lit(0))))
    in_range = Window.partitionBy("_pid").orderBy("raw_id")
    return (parts.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
            .select("raw_id",
                    (F.row_number().over(in_range) + F.col("_off"))
                    .cast("bigint").alias("nodeId")))


def read_neo4j_csv(spark: SparkSession, nodes_path: str,
                   rels_path: str,
                   skip_bad_relationships: bool = False) -> PropertyGraph:
    """neo4j-admin CSV layout → validated PropertyGraph.

    A relationship naming an unknown node ID fails the read by default
    (the same default as ``neo4j-admin database import``);
    ``skip_bad_relationships=True`` drops such rows instead (the
    importer's ``--skip-bad-relationships`` analog)."""
    raw_nodes = spark.read.option("header", True).csv(nodes_path)
    raw_rels = spark.read.option("header", True).csv(rels_path)

    id_col = _find(raw_nodes.columns, ":ID")
    label_col = _find(raw_nodes.columns, ":LABEL")
    prop_cols = [c for c in raw_nodes.columns if c not in (id_col, label_col)]

    idmap = _id_map(
        raw_nodes.select(F.col(id_col).alias("raw_id")).distinct())
    nodes = (
        raw_nodes
        .join(idmap, raw_nodes[id_col] == idmap["raw_id"])
        .select(
            "nodeId",
            _single_label(F.col(label_col)).alias("label"),
            *[F.col(c).alias(_prop_name(c)) for c in prop_cols]))

    start_col = _find(raw_rels.columns, ":START_ID")
    end_col = _find(raw_rels.columns, ":END_ID")
    type_col = _find(raw_rels.columns, ":TYPE")
    src_map = idmap.select(F.col("raw_id").alias("_sid"),
                           F.col("nodeId").alias("src"))
    dst_map = idmap.select(F.col("raw_id").alias("_did"),
                           F.col("nodeId").alias("dst"))
    joined = (
        raw_rels
        .join(src_map, raw_rels[start_col] == src_map["_sid"], "left")
        .join(dst_map, raw_rels[end_col] == dst_map["_did"], "left"))
    if not skip_bad_relationships:
        bad = joined.filter(F.col("src").isNull() | F.col("dst").isNull())
        sample = [(r[start_col], r[end_col]) for r in bad.limit(3).collect()]
        if sample:
            raise ValueError(
                f"relationships reference unknown node IDs, e.g. {sample} "
                "— fix the export or pass skip_bad_relationships=True")
    edges = (
        joined.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select(
            F.monotonically_increasing_id().alias("edgeId"),
            "src", "dst", F.col(type_col).alias("relType")))

    graph = PropertyGraph(nodes=nodes, edges=edges)
    graph.validate()
    return graph


def write_neo4j_csv(graph: PropertyGraph, nodes_path: str,
                    rels_path: str) -> None:
    """PropertyGraph → neo4j-admin importable CSV layout (with the
    catch-all label restored, mirroring stark_neo4j_loading.py)."""
    prop_cols = [c for c in graph.nodes.columns
                 if c not in ("nodeId", "label")]
    (graph.nodes.select(
        F.col("nodeId").cast("string").alias("nodeId:ID"),
        F.concat(F.col("label"), F.lit(";" + CATCH_ALL)).alias(":LABEL"),
        *[F.col(c) for c in prop_cols])
     .write.mode("overwrite").option("header", True).csv(nodes_path))
    (graph.edges.select(
        F.col("src").cast("string").alias(":START_ID"),
        F.col("dst").cast("string").alias(":END_ID"),
        F.col("relType").alias(":TYPE"))
     .write.mode("overwrite").option("header", True).csv(rels_path))
