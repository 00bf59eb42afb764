"""Graph pattern operators (SURVEY §2.B) as driver-contract queries.

Anchors are *names*, deliberately including the duplicated part names
(64 distinct names over all parts) so multi-binding semantics
(SURVEY §7.3) are exercised against the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.graph import GRAPH_ORACLE_CTE, tpch_graph
from graphraft_spark.patterns import onehop, twohop
from graphraft_spark.patterns.compiler import run_pattern
from graphraft_spark.patterns.enumerate import enumerate_pattern, enumerate_paths
from graphraft_spark.registry import register
from graphraft_spark.sources.pq_cache import load_pq

ANCHORS = ["small ring", "NATION_7", "Customer#000000042"]
ANCHORS_SQL = "SELECT * FROM (VALUES ('small ring'), ('NATION_7'), ('Customer#000000042')) AS a(name)"

# Two duplicated part names: 2-path midpoints are Orders containing both
# and Suppliers supplying both; self-pairs (two distinct parts sharing a
# name) are legal bindings too (UNWIND x UNWIND, src1<>src2 on nodeIds).
PAIR_ANCHORS = ["small ring", "red widget"]
PAIR_ANCHORS_SQL = "SELECT * FROM (VALUES ('small ring'), ('red widget')) AS a(name)"

# gold answer ids for supervised enumeration: a few Part nodeIds
GOLD_TGT_IDS = [3000000000 + k for k in (3, 17, 42, 99, 123, 1500)]
GOLD_TGT_IDS_SQL = ", ".join(str(i) for i in GOLD_TGT_IDS)


@register(
    "g_onehop_enum", extra=True,
    oracle=GRAPH_ORACLE_CTE + f"""
, anchors AS ({ANCHORS_SQL})
SELECT n1.label AS label1, n1.name AS name1, e.relType AS type1,
       n2.label AS label2, COUNT(DISTINCT n2.nodeId) AS totalCnt
FROM nodes n1
JOIN anchors a ON n1.name = a.name
JOIN undirected_edges e ON e.src = n1.nodeId
JOIN nodes n2 ON n2.nodeId = e.dst
GROUP BY n1.label, n1.name, e.relType, n2.label
""")
def g_onehop_enum(spark, sf_dir):
    """B1-B3+B6: 1-hop undirected expansion, grouped distinct-target
    counts (path_retriever.py:4-6)."""
    return enumerate_pattern(tpch_graph(spark, sf_dir), "1hop", ANCHORS)


@register(
    "g_twohop_enum", extra=True,  # demoted r13 (eighth wave)
    oracle=GRAPH_ORACLE_CTE + f"""
, anchors AS ({ANCHORS_SQL})
SELECT n1.label AS label1, n1.name AS name1, e1.relType AS type1,
       n2.label AS label2, e2.relType AS type2, n3.label AS label3,
       COUNT(DISTINCT n3.nodeId) AS totalCnt
FROM nodes n1
JOIN anchors a ON n1.name = a.name
JOIN undirected_edges e1 ON e1.src = n1.nodeId
JOIN nodes n2 ON n2.nodeId = e1.dst
JOIN undirected_edges e2 ON e2.src = n2.nodeId
JOIN nodes n3 ON n3.nodeId = e2.dst
WHERE e1.edgeId <> e2.edgeId AND n3.nodeId <> n1.nodeId
GROUP BY n1.label, n1.name, e1.relType, n2.label, e2.relType, n3.label
""")
def g_twohop_enum(spark, sf_dir):
    """B4+B6: 2-hop expansion with tgt<>src and exact relationship
    uniqueness (path_retriever.py:7-9, SURVEY §7.2)."""
    return enumerate_pattern(tpch_graph(spark, sf_dir), "2hop", ANCHORS)


@register(
    "g_twopath_enum", extra=True,  # demoted r7: template covered by p_full_pipeline; slot to s_bm25_indexed
    oracle=GRAPH_ORACLE_CTE + f"""
, anchors AS ({PAIR_ANCHORS_SQL})
SELECT n1.label AS label1, n1.name AS name1, e1.relType AS type1,
       n2.label AS label2, e2.relType AS type2, n3.label AS label3,
       n3.name AS name3, COUNT(DISTINCT n2.nodeId) AS totalCnt
FROM nodes n1
JOIN anchors a1 ON n1.name = a1.name
JOIN undirected_edges e1 ON e1.src = n1.nodeId
JOIN nodes n2 ON n2.nodeId = e1.dst
JOIN undirected_edges e2 ON e2.src = n2.nodeId
JOIN nodes n3 ON n3.nodeId = e2.dst
JOIN anchors a3 ON n3.name = a3.name
WHERE e1.edgeId <> e2.edgeId AND n3.nodeId <> n1.nodeId
GROUP BY n1.label, n1.name, e1.relType, n2.label, e2.relType, n3.label, n3.name
""")
def g_twopath_enum(spark, sf_dir):
    """B5+B6: 2-path meet between two anchor sets, midpoints counted
    (path_retriever.py:10-13)."""
    return enumerate_pattern(tpch_graph(spark, sf_dir), "2path", PAIR_ANCHORS)


@register(
    "g_supervised_enum",
    oracle=GRAPH_ORACLE_CTE + f"""
, anchors AS ({ANCHORS_SQL})
SELECT n1.label AS label1, n1.name AS name1, e.relType AS type1,
       n2.label AS label2, COUNT(DISTINCT n2.nodeId) AS totalCnt,
       COUNT(DISTINCT CASE WHEN n2.nodeId IN ({GOLD_TGT_IDS_SQL})
                           THEN n2.nodeId END) AS correctCnt
FROM nodes n1
JOIN anchors a ON n1.name = a.name
JOIN undirected_edges e ON e.src = n1.nodeId
JOIN nodes n2 ON n2.nodeId = e.dst
GROUP BY n1.label, n1.name, e.relType, n2.label
""")
def g_supervised_enum(spark, sf_dir):
    """B7: supervised overlap count — #distinct targets that are gold
    answers (path_retriever.py:16)."""
    return enumerate_pattern(tpch_graph(spark, sf_dir), "1hop", ANCHORS,
                             tgt_ids=GOLD_TGT_IDS)


@register(
    "g_enum_all_pruned",
    oracle=GRAPH_ORACLE_CTE + f"""
, anchors AS ({ANCHORS_SQL}),
hop1 AS (
  SELECT '1hop' AS pattern, n1.label AS label1, n1.name AS name1,
         e.relType AS type1, n2.label AS label2,
         CAST(NULL AS VARCHAR) AS type2, CAST(NULL AS VARCHAR) AS label3,
         CAST(NULL AS VARCHAR) AS name3,
         COUNT(DISTINCT n2.nodeId) AS totalCnt
  FROM nodes n1
  JOIN anchors a ON n1.name = a.name
  JOIN undirected_edges e ON e.src = n1.nodeId
  JOIN nodes n2 ON n2.nodeId = e.dst
  WHERE n2.label = 'Order'
  GROUP BY n1.label, n1.name, e.relType, n2.label
),
hop2 AS (
  SELECT '2hop' AS pattern, n1.label AS label1, n1.name AS name1,
         e1.relType AS type1, n2.label AS label2, e2.relType AS type2,
         n3.label AS label3, CAST(NULL AS VARCHAR) AS name3,
         COUNT(DISTINCT n3.nodeId) AS totalCnt
  FROM nodes n1
  JOIN anchors a ON n1.name = a.name
  JOIN undirected_edges e1 ON e1.src = n1.nodeId
  JOIN nodes n2 ON n2.nodeId = e1.dst
  JOIN undirected_edges e2 ON e2.src = n2.nodeId
  JOIN nodes n3 ON n3.nodeId = e2.dst
  WHERE e1.edgeId <> e2.edgeId AND n3.nodeId <> n1.nodeId
        AND n3.label = 'Order'
  GROUP BY n1.label, n1.name, e1.relType, n2.label, e2.relType, n3.label
)
SELECT * FROM hop1 UNION ALL SELECT * FROM hop2
""")
def g_enum_all_pruned(spark, sf_dir):
    """B10 + retrieve_paths union: 1hop+2hop enumeration with
    specific-target-label pruning (intended semantics of
    path_retriever.py:42-47,58-60 — MAG keeps Paper-terminal paths;
    here the terminal label is 'Order')."""
    return enumerate_paths(
        tpch_graph(spark, sf_dir), ANCHORS, patterns=("1hop", "2hop"),
        specific_target_label="Order",
    ).drop("correctCnt")


@register(
    "g_pattern_exec_2hop", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
SELECT DISTINCT n3.name AS name
FROM nodes n1
JOIN undirected_edges e1 ON e1.src = n1.nodeId AND e1.relType = 'PLACED'
JOIN nodes n2 ON n2.nodeId = e1.dst AND n2.label = 'Order'
JOIN undirected_edges e2 ON e2.src = n2.nodeId AND e2.relType = 'CONTAINS'
JOIN nodes n3 ON n3.nodeId = e2.dst AND n3.label = 'Part'
WHERE n1.label = 'Customer' AND n1.name = 'Customer#000000042'
      AND e1.edgeId <> e2.edgeId
""")
def g_pattern_exec_2hop(spark, sf_dir):
    """B11+B12: instantiated 2hop pattern execution → RETURN DISTINCT
    x3.name (path_retriever.py:36, create_query → retriever.py:77-79)."""
    spec = twohop("Customer", "Customer#000000042", "PLACED", "Order",
                  "CONTAINS", "Part")
    return run_pattern(tpch_graph(spark, sf_dir), spec)


@register(
    "g_pattern_exec_1hop_multibind", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
SELECT DISTINCT n2.name AS name
FROM nodes n1
JOIN undirected_edges e1 ON e1.src = n1.nodeId AND e1.relType = 'SUPPLIED_BY'
JOIN nodes n2 ON n2.nodeId = e1.dst AND n2.label = 'Supplier'
WHERE n1.label = 'Part' AND n1.name = 'small ring'
""")
def g_pattern_exec_1hop_multibind(spark, sf_dir):
    """B12 with a multi-binding anchor: 'small ring' names ~3% of all
    parts; DISTINCT projection collapses across bindings (SURVEY §7.3)."""
    spec = onehop("Part", "small ring", "SUPPLIED_BY", "Supplier")
    return run_pattern(tpch_graph(spark, sf_dir), spec)


@register(
    "g_answer_lookup", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
SELECT n.name AS name
FROM nodes n
JOIN (VALUES (1000000007), (3000000042), (4000000005),
             (6000000123)) AS ids(nodeId)
  ON n.nodeId = ids.nodeId
""")
def g_answer_lookup(spark, sf_dir):
    """B13: answer-name lookup by nodeId list (retriever.py:19-21) —
    broadcast equi-join of a tiny id frame against nodes."""
    g = tpch_graph(spark, sf_dir)
    ids = spark.createDataFrame(
        [(1000000007,), (3000000042,), (4000000005,), (6000000123,)],
        "nodeId bigint")
    return g.nodes.join(F.broadcast(ids), "nodeId").select("name")


@register(
    "g_degree_by_label", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
SELECT n.label AS label, CAST(COUNT(*) AS BIGINT) AS edge_endpoints,
       COUNT(DISTINCT e.src) AS connected_nodes
FROM undirected_edges e
JOIN nodes n ON n.nodeId = e.src
GROUP BY n.label
""")
def g_degree_by_label(spark, sf_dir):
    """Degree profile per label over the undirected view — the skew
    diagnostic that sizes hub-node handling (SURVEY §7.1 / AQE skew)."""
    g = tpch_graph(spark, sf_dir)
    return (
        g.undirected_edges.join(g.nodes, F.col("src") == F.col("nodeId"))
        .groupBy("label")
        .agg(F.count("*").alias("edge_endpoints"),
             F.countDistinct("src").alias("connected_nodes"))
    )


@register(
    "g_ingest_validate",
    oracle=GRAPH_ORACLE_CTE + """
, emb_norms AS (
    SELECT vec_id,
           sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
emb_after AS (
    SELECT vec_id, n1,
           CASE WHEN n1 > 0 THEN sqrt(list_sum(list_transform(e,
                x -> (x / n1) * (x / n1)))) END AS n2
    FROM emb_norms
)
SELECT 'node' AS kind, label AS name, COUNT(*) AS n_rows,
       COUNT(DISTINCT nodeId) AS n_distinct, CAST(0 AS BIGINT) AS n_bad
FROM nodes GROUP BY label
UNION ALL
SELECT 'edge', e.relType, COUNT(*), COUNT(DISTINCT e.edgeId),
       CAST(SUM(CASE WHEN n1.nodeId IS NULL OR n2.nodeId IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM edges e
LEFT JOIN nodes n1 ON n1.nodeId = e.src
LEFT JOIN nodes n2 ON n2.nodeId = e.dst
GROUP BY e.relType
UNION ALL
SELECT 'embedding', 'l2_normalized', COUNT(*), COUNT(DISTINCT vec_id),
       CAST(SUM(CASE WHEN n2 IS NULL OR abs(n2 - 1.0) > 0.0001
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM emb_after
""")
def g_ingest_validate(spark, sf_dir):
    """A1+A2+A3+A4: full ingest audit in one table —

    * per label: row count vs distinct nodeId (equal iff the unique-key
      constraint holds, stark_neo4j_loading.py:22-23);
    * per relType: edge count, distinct edgeId, DANGLING endpoint count
      (referential integrity, the MERGE-by-id invariant);
    * embeddings: after ingest_embeddings L2 normalization every
      vector's norm is 1 within 1e-4 (stark_neo4j_loading.py:63-80 —
      with unit vectors cosine == dot downstream).
    """
    from graphraft_spark.graph.ingest import ingest_embeddings
    from graphraft_spark.search.vector import norm_col

    g = tpch_graph(spark, sf_dir)
    node_audit = g.nodes.groupBy(
        F.lit("node").alias("kind"), F.col("label").alias("name")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("nodeId").alias("n_distinct"),
        F.lit(0).cast("bigint").alias("n_bad"))

    n1 = g.nodes.select(F.col("nodeId").alias("_src_id"))
    n2 = g.nodes.select(F.col("nodeId").alias("_dst_id"))
    edge_audit = (
        g.edges
        .join(n1, F.col("src") == F.col("_src_id"), "left")
        .join(n2, F.col("dst") == F.col("_dst_id"), "left")
        .groupBy(F.lit("edge").alias("kind"), F.col("relType").alias("name"))
        .agg(F.count("*").alias("n_rows"),
             F.countDistinct("edgeId").alias("n_distinct"),
             F.sum(F.when(F.col("_src_id").isNull()
                          | F.col("_dst_id").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_bad"))
    )

    emb_raw = load_pq(spark, f"{sf_dir}/embeddings.parquet")
    ids = emb_raw.select(F.col("vec_id").alias("nodeId"))
    normed = ingest_embeddings(ids, emb_raw, "embedding", key_col="vec_id")
    emb_audit = (
        normed.select("nodeId", norm_col(F.col("embedding")).alias("n2"))
        .groupBy(F.lit("embedding").alias("kind"),
                 F.lit("l2_normalized").alias("name"))
        .agg(F.count("*").alias("n_rows"),
             F.countDistinct("nodeId").alias("n_distinct"),
             F.sum(F.when(F.col("n2").isNull()
                          | (F.abs(F.col("n2") - 1.0) > 1e-4), 1)
                   .otherwise(0)).cast("bigint").alias("n_bad"))
    )
    return node_audit.unionByName(edge_audit).unionByName(emb_audit)


@register(
    "g_ingest_normalize", extra=True,
    oracle="""
WITH raw AS (
    SELECT DISTINCT lower(p_type) || '_of/' || lower(l_returnflag)
               AS node_type,
           lower(p_type) || '___cites-' || lower(l_returnflag) || ' rel'
               AS edge_type
    FROM part JOIN lineitem ON l_partkey = p_partkey
)
SELECT node_type, edge_type,
       array_to_string(list_transform(
           string_split(replace(node_type, '/', '_or_'), '_'),
           s -> upper(substr(s, 1, 1)) || lower(substr(s, 2))), '')
           AS label,
       upper(string_split(edge_type, '___')[2]) AS rel_mag,
       upper(replace(replace(edge_type, ' ', '_'), '-', '_')) AS rel_other
FROM raw
""")
def g_ingest_normalize(spark, sf_dir):
    """A6: ingest name normalization — label formatter
    (field_of_study→FieldOfStudy, '/'→'_or_') and relationship-type
    formatter (MAG '___' middle segment vs space/hyphen→'_' uppercase)
    (stark_neo4j_loading.py:11-18)."""
    from graphraft_spark.graph.ingest import (
        format_node_label, format_relationship_type)

    p = load_pq(spark, f"{sf_dir}/part.parquet")
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    raw = (
        p.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.concat(F.lower("p_type"), F.lit("_of/"),
                     F.lower("l_returnflag")).alias("node_type"),
            F.concat(F.lower("p_type"), F.lit("___cites-"),
                     F.lower("l_returnflag"), F.lit(" rel"))
            .alias("edge_type"))
        .distinct()
    )
    return raw.select(
        "node_type", "edge_type",
        format_node_label(F.col("node_type")).alias("label"),
        format_relationship_type(F.col("edge_type"), "mag").alias("rel_mag"),
        format_relationship_type(F.col("edge_type"), "prime")
        .alias("rel_other"),
    )


_SQL_ONEHOP = """
SELECT n1.label AS label1, n1.name AS name1, e.relType AS type1,
       n2.label AS label2, COUNT(DISTINCT n2.nodeId) AS totalCnt
FROM nodes n1
JOIN undirected_edges e ON e.src = n1.nodeId
JOIN nodes n2 ON n2.nodeId = e.dst
WHERE n1.name IN ('small ring', 'NATION_7', 'Customer#000000042')
GROUP BY n1.label, n1.name, e.relType, n2.label
"""


@register("g_sql_onehop", extra=True,
          oracle=GRAPH_ORACLE_CTE + _SQL_ONEHOP)
def g_sql_onehop(spark, sf_dir):
    """The pure-SQL engine surface: the IDENTICAL query text runs on
    Spark (over register_sql_views' temp views) and on DuckDB (over the
    oracle CTE graph derivation) — a reference user can drive the whole
    graph in spark.sql without touching the DataFrame API."""
    from graphraft_spark.graph.tpch import register_sql_views

    register_sql_views(spark, sf_dir)
    return spark.sql(_SQL_ONEHOP)


@register(
    "g_degree_top", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
SELECT n.nodeId, n.label, d.degree
FROM (
    SELECT nodeId, COUNT(*) AS degree FROM (
        SELECT src AS nodeId FROM edges
        UNION ALL
        SELECT dst AS nodeId FROM edges
    ) GROUP BY nodeId
) d
JOIN nodes n ON n.nodeId = d.nodeId
ORDER BY d.degree DESC, n.nodeId LIMIT 20
""")
def g_degree_top(spark, sf_dir):
    """Degree centrality (graph/algos.py:degrees): hub detection over
    the property graph — one shuffle keyed by node id, then a top-k
    (TakeOrderedAndProject) against the broadcast node dim."""
    from graphraft_spark.graph.algos import degrees

    g = tpch_graph(spark, sf_dir)
    return (
        degrees(g.edges)
        .join(g.nodes.select("nodeId", "label"), "nodeId")
        .select("nodeId", "label", "degree")
        .orderBy(F.desc("degree"), F.asc("nodeId"))
        .limit(20)
    )


@register("g_pagerank_top", extra=True)  # rows-only: iterative float algo
def g_pagerank_top(spark, sf_dir):
    """PageRank top-20 (graph/algos.py:pagerank, 10 rounds): node
    importance over the directed property graph.  Rows-only (top-20
    float rank); the same engine op is HASH-MATCHED in
    g_pagerank_types (unrolled 5-round SQL on the type graph), and
    semantics are additionally pinned by tests/test_graph_algos.py's
    exact parity (1e-12) with an independent dense numpy power
    iteration, including dangling-mass redistribution."""
    from graphraft_spark.graph.algos import pagerank

    g = tpch_graph(spark, sf_dir)
    pr = pagerank(g.nodes.select("nodeId"), g.edges.select("src", "dst"),
                  n_iter=10)
    return (
        pr.join(g.nodes.select("nodeId", "label", "name"), "nodeId")
        .select("nodeId", "label", "name",
                F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("nodeId"))
        .limit(20)
    )


# Shared recursive-CTE text: Spark 4.1 and DuckDB both execute this
# verbatim (Spark over the register_sql_views temp views, DuckDB over
# the GRAPH_ORACLE_CTE tables) — min-depth BFS from one seed with a
# walk bound, aggregation kept OUTSIDE the recursive term (neither
# engine allows it inside).
_REACH_SQL = """
WITH RECURSIVE walk(nodeId, depth) AS (
    SELECT nodeId, 0 AS depth FROM nodes
    WHERE name = 'NATION_7' AND label = 'Nation'
    UNION ALL
    SELECT e.dst, w.depth + 1
    FROM walk w JOIN undirected_edges e ON e.src = w.nodeId
    WHERE w.depth < 2
)
SELECT depth, COUNT(*) AS n_nodes
FROM (SELECT nodeId, MIN(depth) AS depth FROM walk GROUP BY nodeId)
GROUP BY depth
"""


@register(
    "g_reachability_cte", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
, walk_base AS (
    SELECT nodeId, 0 AS depth FROM nodes
    WHERE name = 'NATION_7' AND label = 'Nation'
),
walk1 AS (
    SELECT e.dst AS nodeId, 1 AS depth
    FROM walk_base w JOIN undirected_edges e ON e.src = w.nodeId
),
walk2 AS (
    SELECT e.dst AS nodeId, 2 AS depth
    FROM walk1 w JOIN undirected_edges e ON e.src = w.nodeId
),
walk AS (
    SELECT * FROM walk_base UNION ALL
    SELECT * FROM walk1 UNION ALL SELECT * FROM walk2
)
SELECT depth, COUNT(*) AS n_nodes
FROM (SELECT nodeId, MIN(depth) AS depth FROM walk GROUP BY nodeId)
GROUP BY depth
""")
def g_reachability_cte(spark, sf_dir):
    """Min-depth BFS reachability (depth ≤ 2) from one seed node via a
    Spark 4 RECURSIVE CTE over the registered graph views — the
    hierarchy/transitive-closure §2.H shape.  The DuckDB oracle unrolls
    the same two levels explicitly (its WITH RECURSIVE cannot follow
    another CTE list in one statement), so both engines compute
    identical walk multisets before the outer min-depth aggregation."""
    from graphraft_spark.graph.tpch import register_sql_views

    register_sql_views(spark, sf_dir)
    return spark.sql(_REACH_SQL)


@register("g_ppr_top", extra=True)  # rows-only: iterative float algo
def g_ppr_top(spark, sf_dir):
    """Personalized PageRank from the standard anchor entities
    (graph/algos.py:personalized_pagerank, 10 rounds) — the graph-
    proximity retrieval score: candidates rank by closeness to the
    question's anchors rather than global importance.  Rows-only
    (top-k float rank); the same engine op is HASH-MATCHED in
    g_ppr_types, and 1e-12 numpy parity is pinned in
    tests/test_graph_algos.py (teleport-to-seeds, dangling-to-seeds)."""
    from graphraft_spark.graph.algos import personalized_pagerank

    g = tpch_graph(spark, sf_dir)
    seeds = (g.nodes.filter(F.col("name").isin(ANCHORS))
             .select("nodeId"))
    pr = personalized_pagerank(
        g.nodes.select("nodeId"),
        g.undirected_edges.select("src", "dst"), seeds, n_iter=10)
    return (
        pr.join(g.nodes.select("nodeId", "label", "name"), "nodeId")
        .filter(F.col("rank") > 0)
        .select("nodeId", "label", "name",
                F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("nodeId"))
        .limit(20)
    )


@register(
    "g_triangles",  # promoted r13 (eighth wave)
    oracle=GRAPH_ORACLE_CTE + """
, ue AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM ue e1
    JOIN ue e2 ON e2.a = e1.b
    JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n, CAST(count(*) AS BIGINT) AS triangles
FROM (
    SELECT x AS n FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
GROUP BY n
""")
def g_triangles(spark, sf_dir):
    """Per-node triangle counts (graph/algos.py:triangle_count):
    degree-ordered orientation bounds wedge enumeration at O(|E|^1.5)
    total with no last-reducer hub skew.  The oracle enumerates
    id-ordered triangles directly — same multiset."""
    from graphraft_spark.graph.algos import triangle_count

    g = tpch_graph(spark, sf_dir)
    return triangle_count(g.edges, "src", "dst")


@register(
    "g_clustering_coeff", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
, ue AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS (
    SELECT n, count(*) AS deg FROM (
        SELECT a AS n FROM ue UNION ALL SELECT b AS n FROM ue
    ) GROUP BY n
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM ue e1
    JOIN ue e2 ON e2.a = e1.b
    JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
    SELECT n, count(*) AS triangles FROM (
        SELECT x AS n FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ) GROUP BY n
)
SELECT d.n, CAST(d.deg AS BIGINT) AS deg,
       ROUND(CASE WHEN d.deg >= 2
             THEN COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1) / 2.0)
             ELSE 0.0 END, 6) AS lcc
FROM deg d LEFT JOIN tcnt t ON t.n = d.n
""")
def g_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient (graph/algos.py) — triangles over
    possible neighbor pairs per node; the oracle recomputes both
    aggregates in SQL."""
    from graphraft_spark.graph.algos import clustering_coefficient

    g = tpch_graph(spark, sf_dir)
    out = clustering_coefficient(g.edges, "src", "dst")
    return out.select("n", F.col("deg").cast("bigint").alias("deg"),
                      F.round("lcc", 6).alias("lcc"))


@register(
    "g_adamic_adar", extra=True,
    oracle=GRAPH_ORACLE_CTE + """
, ue AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
nb AS (
    SELECT a AS z, b AS x FROM ue
    UNION ALL
    SELECT b AS z, a AS x FROM ue
),
deg AS (SELECT z, count(*) AS deg FROM nb GROUP BY z),
wedges AS (
    SELECT n1.x AS x, n2.x AS y, d.deg
    FROM nb n1 JOIN nb n2 ON n1.z = n2.z AND n1.x < n2.x
    JOIN deg d ON d.z = n1.z
),
scores AS (
    SELECT x, y, sum(1.0 / ln(deg)) AS aa
    FROM wedges GROUP BY x, y
)
SELECT s.x, s.y, ROUND(s.aa, 6) AS aa
FROM scores s
WHERE NOT EXISTS (SELECT 1 FROM ue WHERE ue.a = s.x AND ue.b = s.y)
ORDER BY ROUND(s.aa, 6) DESC, s.x, s.y LIMIT 50
""")
def g_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction (graph/algos.py): top-50 strongest
    unconnected pairs by summed inverse-log common-neighbor degree.
    Exact here; the max_mid_degree cap is the documented hub-skew
    valve at scale."""
    from graphraft_spark.graph.algos import adamic_adar

    g = tpch_graph(spark, sf_dir)
    out = adamic_adar(g.edges, "src", "dst")
    return (out.select("x", "y", F.round("aa", 6).alias("aa"))
            .orderBy(F.desc("aa"), F.asc("x"), F.asc("y"))
            .limit(50))


_H60G = ("(('0x' || substr(md5('{salt}' || CAST(src AS VARCHAR) || '#' "
         "|| CAST(dst AS VARCHAR)), 1, 15))::BIGINT)")


@register(
    "g_khop_sample", extra=True,
    oracle=GRAPH_ORACLE_CTE + f"""
, ue AS (SELECT DISTINCT src, dst FROM edges),
seeds AS (SELECT * FROM (VALUES (4000000000), (4000000001),
                                (4000000002), (4000000003),
                                (4000000004)) s(src)),
r0 AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
             ORDER BY {_H60G.format(salt='s0#h0')}, dst) AS nbr_rank
  FROM ue
),
h1 AS (
  SELECT r0.src, r0.dst, CAST(nbr_rank AS INT) AS nbr_rank,
         CAST(1 AS INT) AS hop
  FROM r0 JOIN seeds USING (src) WHERE nbr_rank <= 3
),
f1 AS (SELECT DISTINCT dst AS src FROM h1),
r1 AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src
             ORDER BY {_H60G.format(salt='s0#h1')}, dst) AS nbr_rank
  FROM ue
),
h2 AS (
  SELECT r1.src, r1.dst, CAST(nbr_rank AS INT) AS nbr_rank,
         CAST(2 AS INT) AS hop
  FROM r1 JOIN f1 USING (src) WHERE nbr_rank <= 2
)
SELECT * FROM h1 UNION ALL SELECT * FROM h2
""")
def g_khop_sample(spark, sf_dir):
    """GraphSAGE-style layered neighbor sampling (graph/sampling.py):
    fanout (3, 2) from five nation seeds, deterministic per-hop-salted
    portable-hash ranks — the GNN mini-batch primitive, replayed
    layer-by-layer in the oracle."""
    from graphraft_spark.graph.sampling import khop_sample

    g = tpch_graph(spark, sf_dir)
    seeds = spark.createDataFrame(
        [(4_000_000_000 + i,) for i in range(5)], "nodeId bigint")
    out = khop_sample(g.edges, seeds, fanouts=(3, 2), seed="s0")
    return out.select("src", "dst",
                      F.col("nbr_rank").cast("int").alias("nbr_rank"),
                      F.col("hop").cast("int").alias("hop"))


@register(
    "g_random_walks",  # promoted r13 (eighth wave)
    oracle=GRAPH_ORACLE_CTE + """, ue AS (SELECT DISTINCT src, dst FROM edges),
p0 AS (SELECT * FROM (VALUES (0, 4000000000), (1, 4000000001), (2, 4000000002), (3, 4000000003), (4, 4000000004), (5, 4000000000), (6, 4000000001), (7, 4000000002), (8, 4000000003), (9, 4000000004)) s(walk_id, node)),
p1 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#1#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p0 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p2 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#2#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p1 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p3 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#3#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p2 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p4 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#4#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p3 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
)
SELECT walk_id, CAST(0 AS INT) AS step, node FROM p0
UNION ALL SELECT walk_id, CAST(1 AS INT) AS step, node FROM p1
UNION ALL SELECT walk_id, CAST(2 AS INT) AS step, node FROM p2
UNION ALL SELECT walk_id, CAST(3 AS INT) AS step, node FROM p3
UNION ALL SELECT walk_id, CAST(4 AS INT) AS step, node FROM p4
""")
def g_random_walks(spark, sf_dir):
    """Deterministic DeepWalk corpus (graph/sampling.py:random_walks):
    ten 4-step walks from nation starts, next hop = minimal portable
    hash of (seed, walk_id, step, current, neighbor) — replayed
    step-by-step by the unrolled oracle."""
    from graphraft_spark.graph.sampling import random_walks

    g = tpch_graph(spark, sf_dir)
    starts = spark.createDataFrame(
        [(i, 4_000_000_000 + (i % 5)) for i in range(10)],
        "walk_id bigint, node bigint")
    out = random_walks(g.edges, starts, length=4, seed="w0")
    return out.select("walk_id", F.col("step").cast("int").alias("step"),
                      "node")


@register(
    "g_walk_skipgrams", extra=True,
    oracle=GRAPH_ORACLE_CTE + """, ue AS (SELECT DISTINCT src, dst FROM edges),
p0 AS (SELECT * FROM (VALUES (0, 4000000000), (1, 4000000001), (2, 4000000002), (3, 4000000003), (4, 4000000004), (5, 4000000000), (6, 4000000001), (7, 4000000002), (8, 4000000003), (9, 4000000004)) s(walk_id, node)),
p1 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#1#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p0 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p2 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#2#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p1 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p3 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#3#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p2 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
p4 AS (
  SELECT walk_id, nxt AS node FROM (
    SELECT c.walk_id, c.nxt, c.cur,
           row_number() OVER (PARTITION BY c.walk_id
               ORDER BY (('0x' || substr(md5('w0' || CAST(walk_id AS VARCHAR) || '#4#' || CAST(cur AS VARCHAR) || '#' || CAST(nxt AS VARCHAR)), 1, 15))::BIGINT), c.nxt) AS rn
    FROM (SELECT w.walk_id, w.node AS cur, ue.dst AS nxt
          FROM p3 w JOIN ue ON ue.src = w.node) c
  ) WHERE rn = 1
),
walks AS (
  SELECT walk_id, 0 AS step, node FROM p0
  UNION ALL SELECT walk_id, 1 AS step, node FROM p1
  UNION ALL SELECT walk_id, 2 AS step, node FROM p2
  UNION ALL SELECT walk_id, 3 AS step, node FROM p3
  UNION ALL SELECT walk_id, 4 AS step, node FROM p4
)
SELECT a.node AS center, b.node AS context,
       CAST(count(*) AS BIGINT) AS cnt
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id AND a.step <> b.step
 AND abs(a.step - b.step) <= 2
GROUP BY a.node, b.node
""")
def g_walk_skipgrams(spark, sf_dir):
    """Skip-gram co-occurrence pairs (window 2) over the deterministic
    walk corpus — the word2vec training examples of DeepWalk, oracle-
    replayed end to end (walk generation + bounded self-join)."""
    from graphraft_spark.graph.sampling import random_walks, skipgram_pairs

    g = tpch_graph(spark, sf_dir)
    starts = spark.createDataFrame(
        [(i, 4_000_000_000 + (i % 5)) for i in range(10)],
        "walk_id bigint, node bigint")
    walks = random_walks(g.edges, starts, length=4, seed="w0")
    return skipgram_pairs(walks, window=2)


@register("g_kcore", extra=True)  # rows-only: iterative peeling
def g_kcore(spark, sf_dir):
    """3-core of the property graph (graph/algos.py:k_core) — the
    dense backbone after iteratively peeling degree<3 nodes.
    Rows-only on the big graph; the same engine op is HASH-MATCHED
    (integer-exact) in g_kcore_types, and exactness is additionally
    pinned by the pure-Python peeling parity test."""
    from graphraft_spark.graph.algos import k_core

    g = tpch_graph(spark, sf_dir)
    return k_core(g.edges, k=3)


def _lpa_round_sql(r: int) -> str:
    p = f"l{r - 1}"
    return f"""
, c{r} AS (
    SELECT e.src AS nodeId, l.label, COUNT(*) AS c
    FROM (SELECT src, dst FROM undirected_edges
          UNION ALL SELECT nodeId, nodeId FROM nodes) e
    JOIN {p} l ON l.nodeId = e.dst
    GROUP BY 1, 2
),
b{r} AS (
    SELECT nodeId, label FROM (
        SELECT nodeId, label,
               ROW_NUMBER() OVER (PARTITION BY nodeId
                                  ORDER BY c DESC, label) AS rn
        FROM c{r}) WHERE rn = 1
),
l{r} AS (
    SELECT n.nodeId, COALESCE(b.label, n.nodeId) AS label
    FROM nodes n LEFT JOIN b{r} b ON b.nodeId = n.nodeId
)"""


@register(
    "g_label_prop", extra=True,  # demoted r10 (driver-green r8-r9; graph keeps 13 primary rows)
    oracle=GRAPH_ORACLE_CTE
    + ", l0 AS (SELECT nodeId, nodeId AS label FROM nodes)"
    + "".join(_lpa_round_sql(r) for r in (1, 2, 3))
    + "\nSELECT nodeId, label FROM l3")
def g_label_prop(spark, sf_dir):
    """Deterministic synchronous label propagation, 3 rounds
    (graph/algos.py:label_propagation): most-frequent neighbor label,
    min tie-break — community structure over the TPC-H graph; the
    oracle unrolls the rounds (same pattern as g_random_walks)."""
    from graphraft_spark.graph.algos import label_propagation

    g = tpch_graph(spark, sf_dir)
    return label_propagation(g.nodes, g.edges, rounds=3)


def _hits_unrolled_sql(n_iter: int = 3) -> str:
    """Replay hits() as SQL: each iteration is two aggregate joins +
    a window-total normalization, unrolled ``n_iter`` times (fixed
    iteration count is what makes the algorithm oracle-expressible —
    same recipe as g_bfs_distances' bounded recursive walk).  Float
    tolerance: both engines sum the same doubles in different orders;
    the drift is ~n·eps ≈ 1e-12 relative, four orders below the
    round-to-9dp grid the comparison happens on."""
    parts = [
        "\n, n AS (SELECT nodeId FROM nodes)",
        ", h0 AS (SELECT nodeId, CAST(1.0 AS DOUBLE) AS hub FROM n)",
    ]
    prev = "h0"
    for i in range(1, n_iter + 1):
        parts.append(f"""
, a{i}r AS (
    SELECT n.nodeId, COALESCE(x.v, CAST(0 AS DOUBLE)) AS a_raw
    FROM n LEFT JOIN (
        SELECT e.dst AS nodeId, SUM(s.hub) AS v
        FROM edges e JOIN {prev} s ON s.nodeId = e.src
        GROUP BY e.dst) x USING (nodeId))
, a{i} AS (SELECT nodeId, a_raw / SUM(a_raw) OVER () AS authority
           FROM a{i}r)
, h{i}r AS (
    SELECT n.nodeId, COALESCE(x.v, CAST(0 AS DOUBLE)) AS h_raw
    FROM n LEFT JOIN (
        SELECT e.src AS nodeId, SUM(a.authority) AS v
        FROM edges e JOIN a{i} a ON a.nodeId = e.dst
        GROUP BY e.src) x USING (nodeId))
, h{i} AS (SELECT nodeId, h_raw / SUM(h_raw) OVER () AS hub
           FROM h{i}r)""")
        prev = f"h{i}"
    parts.append(f"""
SELECT h.nodeId, nd.label, nd.name,
       ROUND(h.hub, 9) AS hub, ROUND(a.authority, 9) AS authority
FROM h{n_iter} h
JOIN a{n_iter} a USING (nodeId)
JOIN nodes nd USING (nodeId)
ORDER BY ROUND(a.authority, 9) DESC, h.nodeId ASC
LIMIT 20""")
    return GRAPH_ORACLE_CTE + "".join(parts)


@register("g_hits_top", oracle=_hits_unrolled_sql(3))
def g_hits_top(spark, sf_dir):
    """HITS hubs & authorities top-20 (graph/algos.py:hits, 3 rounds,
    L1-normalized): link-analysis importance over the directed property
    graph — the authority score surfaces well-cited targets (Orders/
    Parts), the hub score their heavy pointers (Customers/Suppliers).
    Value-checked (round-9): the fixed 3-iteration schedule unrolls to
    plain SQL (two aggregate joins + a window-total per round), scores
    rounded to 9dp on both sides, the top-20 cut ordered by the ROUNDED
    authority so the boundary is float-drift-proof.  Exact float
    semantics additionally pinned by tests/test_graph_algos_hits.py
    parity (1e-9) with an independent dense numpy power iteration."""
    from graphraft_spark.graph.algos import hits

    g = tpch_graph(spark, sf_dir)
    h = hits(g.nodes.select("nodeId"), g.edges.select("src", "dst"),
             n_iter=3)
    return (
        h.join(g.nodes.select("nodeId", "label", "name"), "nodeId")
        .select("nodeId", "label", "name", "hub", "authority")
        .orderBy(F.desc("authority"), F.asc("nodeId"))
        .limit(20)
    )


@register(
    "g_copurchase_pairs", extra=True,  # demoted r10 (driver-green r9)
    oracle="""
WITH m AS (
    SELECT DISTINCT l_orderkey AS r, l_partkey AS l FROM lineitem
)
SELECT a.l AS part_a, b.l AS part_b, CAST(COUNT(*) AS BIGINT) AS weight
FROM m a JOIN m b ON a.r = b.r AND a.l < b.l
GROUP BY a.l, b.l
HAVING COUNT(*) >= 2
""")
def g_copurchase_pairs(spark, sf_dir):
    """Market-basket co-occurrence (graph/algos.py bipartite_project):
    the order—part bipartite graph projected onto parts — pairs of
    parts appearing in ≥2 common orders, the co-purchase graph that
    feeds item-item recommenders and graph-embedding corpora.  Work is
    C(order_size, 2) per order (order sizes are bounded ≤7 in TPC-H;
    the max_degree cap guards real skew), pairs emitted once (a<b),
    count map-side-combined."""
    from graphraft_spark.graph.algos import bipartite_project

    li = (load_pq(spark, f"{sf_dir}/lineitem.parquet")
          .select(F.col("l_orderkey").alias("src"),
                  F.col("l_partkey").alias("dst")))
    return (bipartite_project(li, left="dst", right="src", min_count=2)
            .select(F.col("a").alias("part_a"), F.col("b").alias("part_b"),
                    "weight"))


@register(
    "g_scc_event_types", extra=True,  # demoted r10 (driver-green r9)
    oracle="""
WITH RECURSIVE seq AS (
    SELECT event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b
    FROM events
),
edges AS (
    SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL AND a <> b
),
n AS (SELECT DISTINCT event_type AS id FROM events),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
mutual AS (
    SELECT r1.a AS id, r1.b AS m
    FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
lab AS (
    SELECT n.id, LEAST(n.id, COALESCE(MIN(m.m), n.id)) AS scc
    FROM n LEFT JOIN mutual m ON m.id = n.id
    GROUP BY n.id
)
SELECT id, scc,
       CAST(COUNT(*) OVER (PARTITION BY scc) AS BIGINT) AS scc_size
FROM lab
""")
def g_scc_event_types(spark, sf_dir):
    """Strongly connected components of the event-type TRANSITION
    graph (graph/algos.py strongly_connected_components): nodes are
    event types, edges the observed consecutive transitions per user —
    an SCC is a recurrent behavioral state set (types reachable from
    each other), the structure session-segmentation and Markov-model
    features hang off.  The engine runs the distributed coloring
    algorithm (trim / forward min-color / backward reach, all
    edge-list joins); the oracle replays it with a recursive transitive
    closure + mutual-reachability grouping — tractable because the
    type graph is small even when the event stream is 100 TB (node
    count = |event_type| — the scale carrier is the pre-aggregation,
    one windowed scan + DISTINCT)."""
    from graphraft_spark.graph.algos import strongly_connected_components
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    nodes = ev.select(F.col("event_type").alias("id")).distinct()
    return strongly_connected_components(nodes, edges)


@register("g_betweenness_top", extra=True)  # rows-only: top-k float rank
def g_betweenness_top(spark, sf_dir):
    """Sampled Brandes betweenness (graph/algos.py betweenness_sampled,
    8 deterministic sources): which nodes sit on the most shortest
    paths — the broker-detection centrality completing the quartet
    next to PageRank/HITS/k-core.  Rows-only by declared design (the
    top-20 LIMIT sits on a float rank, where a 9dp tie at the boundary
    would flake a hash compare); the SAME engine run's full positive
    score set is hash-matched in g_betweenness_fixed below, and the
    float semantics are additionally pinned by
    tests/test_graph_betweenness.py exact parity (1e-6) with an
    independent pure-Python Brandes."""
    from graphraft_spark.graph.algos import betweenness_sampled

    g = tpch_graph(spark, sf_dir)
    b = betweenness_sampled(g.nodes.select("nodeId"),
                            g.edges.select("src", "dst"), n_sources=8)
    return (b.join(g.nodes.select("nodeId", "label", "name"), "nodeId")
            .filter(F.col("betweenness") > 0)
            .orderBy(F.desc("betweenness"), F.asc("nodeId"))
            .limit(20))


def _betweenness_fixed_sql(max_d: int = 6) -> str:
    """Value oracle for the fixed-8-source sampled Brandes on the FULL
    TPC-H graph (r9 verdict item 3): restrict the walk-count matrix to
    the forward closure of the 8 smallest node ids — the layered
    customer→order→part→supplier→nation→region DAG keeps that closure
    proportional to 8 customers' neighborhoods (orders-per-customer and
    lineitems-per-order are sf-invariant), so the |closure|² pair table
    stays small at EVERY sf even though the whole graph grows.  Within
    the closure the recipe is g_betweenness_types': minimal-length walk
    counts are exactly sigma; then the Brandes pair-dependency identity
    with s restricted to the 8 sources."""
    head = GRAPH_ORACLE_CTE.replace("\nWITH ", "\nWITH RECURSIVE ", 1)
    parts = [head, """,
src AS (SELECT nodeId AS s FROM nodes ORDER BY nodeId LIMIT 8),
reach(node) AS (
    SELECT s FROM src
    UNION
    SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
),
se AS (
    SELECT DISTINCT src, dst FROM edges
    WHERE src <> dst AND src IN (SELECT node FROM reach)
),
p0 AS (SELECT node AS s2, node AS t, CAST(1 AS DOUBLE) AS c FROM reach)"""]
    for d in range(1, max_d + 1):
        parts.append(
            f",\np{d} AS (SELECT p.s2, e.dst AS t, SUM(p.c) AS c\n"
            f"     FROM p{d - 1} p JOIN se e ON e.src = p.t\n"
            f"     GROUP BY p.s2, e.dst)")
    walks = "\n    UNION ALL ".join(
        f"SELECT s2, t, {d} AS d, c FROM p{d}" for d in range(max_d + 1))
    parts.append(f""",
walks AS (
    {walks}
),
pairs AS (
    SELECT s2, t, d AS dist, c AS sigma
    FROM (SELECT s2, t, d, c,
                 ROW_NUMBER() OVER (PARTITION BY s2, t ORDER BY d) AS rn
          FROM walks)
    WHERE rn = 1
),
dep AS (
    SELECT sv.t AS nodeId, SUM(sv.sigma * vt.sigma / st.sigma) AS b
    FROM pairs sv
    JOIN src ON src.s = sv.s2
    JOIN pairs vt ON vt.s2 = sv.t
    JOIN pairs st ON st.s2 = sv.s2 AND st.t = vt.t
    WHERE sv.s2 <> sv.t AND vt.s2 <> vt.t
      AND sv.dist + vt.dist = st.dist
    GROUP BY sv.t
)
SELECT nodeId, ROUND(b, 9) AS betweenness
FROM dep
WHERE ROUND(b, 9) > 0""")
    return "".join(parts)


@register("g_betweenness_fixed",  # promoted r10 (fifth wave)
          oracle=_betweenness_fixed_sql(6))
def g_betweenness_fixed(spark, sf_dir):
    """The value-checked twin of g_betweenness_top on the SAME big
    TPC-H graph (not the small type graph): identical engine run
    (betweenness_sampled, default 8 smallest-node-id sources), but
    returning the full positive score set instead of a float-ranked
    top-20 — the set is bounded by the sources' forward closure, so
    the hash compare is deterministic and cheap at every sf."""
    from graphraft_spark.graph.algos import betweenness_sampled

    g = tpch_graph(spark, sf_dir)
    b = betweenness_sampled(g.nodes.select("nodeId"),
                            g.edges.select("src", "dst"), n_sources=8)
    return b.filter(F.col("betweenness") > 0) \
        .select("nodeId", "betweenness")


_TYPE_GRAPH_SQL = """seq AS (
    SELECT event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b
    FROM events
),
edges AS (
    SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL AND a <> b
),
n AS (SELECT DISTINCT event_type AS id FROM events)"""


def _betweenness_types_sql(max_d: int = 8) -> str:
    """Replay exact all-sources Brandes as SQL on the (small,
    fixed-vocabulary) event-type graph: unrolled walk-count matrix
    powers give per-pair (dist, sigma) — at the minimal length every
    walk IS a shortest path, so the count is exactly sigma — then the
    Brandes pair-dependency identity
    ``b(v) = SUM sigma(s,v)*sigma(v,t)/sigma(s,t)`` over pairs with
    ``d(s,v)+d(v,t)=d(s,t)``, endpoints excluded.  Tractable because
    the type vocabulary keeps the pair tables at |V|^2 ≈ hundreds of
    rows regardless of corpus sf (same carrier argument as
    g_scc_event_types)."""
    parts = [f"WITH {_TYPE_GRAPH_SQL},\n"
             "p0 AS (SELECT id AS s, id AS t, CAST(1 AS DOUBLE) AS c "
             "FROM n)"]
    for d in range(1, max_d + 1):
        parts.append(
            f",\np{d} AS (SELECT p.s, e.b AS t, SUM(p.c) AS c\n"
            f"     FROM p{d - 1} p JOIN edges e ON e.a = p.t\n"
            f"     GROUP BY p.s, e.b)")
    walks = "\n    UNION ALL ".join(
        f"SELECT s, t, {d} AS d, c FROM p{d}" for d in range(max_d + 1))
    parts.append(f""",
walks AS (
    {walks}
),
pairs AS (
    SELECT s, t, d AS dist, c AS sigma
    FROM (SELECT s, t, d, c,
                 ROW_NUMBER() OVER (PARTITION BY s, t ORDER BY d) AS rn
          FROM walks)
    WHERE rn = 1
),
dep AS (
    SELECT sv.t AS node, SUM(sv.sigma * vt.sigma / st.sigma) AS b
    FROM pairs sv
    JOIN pairs vt ON vt.s = sv.t
    JOIN pairs st ON st.s = sv.s AND st.t = vt.t
    WHERE sv.s <> sv.t AND vt.s <> vt.t
      AND sv.dist + vt.dist = st.dist
    GROUP BY sv.t
)
SELECT n.id AS node, ROUND(COALESCE(dep.b, 0), 9) AS betweenness
FROM n LEFT JOIN dep ON dep.node = n.id""")
    return "".join(parts)


@register("g_betweenness_types",  # demoted r12 (green r10-r11)
          oracle=_betweenness_types_sql(8), extra=True)
def g_betweenness_types(spark, sf_dir):
    """EXACT directed betweenness (all sources) on the event-type
    transition graph — the value-checked twin of g_betweenness_top
    (round-9, per the r8 verdict): the fixed type vocabulary keeps the
    graph small at every sf, so the engine's level-synchronous Brandes
    (graph/algos.py betweenness_sampled with sources = every node) is
    hash-comparable to the unrolled pair-dependency SQL above, both
    rounded to 9dp.  The big-graph sampled run stays rows-only in
    g_betweenness_top; its float semantics are pinned here plus the
    numpy-parity suite."""
    from graphraft_spark.graph.algos import betweenness_sampled
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    nodes = ev.select(F.col("event_type").alias("nodeId")).distinct()
    b = betweenness_sampled(nodes, edges, n_sources=100_000, max_depth=8)
    return b.select(F.col("nodeId").alias("node"), "betweenness")


def _pagerank_types_sql(n_iter: int = 5, alpha: float = 0.85) -> str:
    """Unrolled PageRank on the event-type graph — the same
    fixed-iteration recipe as _hits_unrolled_sql: one CTE pair per
    round (dangling-mass scalar + in-mass aggregate), teleport and
    damping written as the SAME literal expressions the engine
    evaluates so the doubles agree to 9dp.  Tractable because the type
    vocabulary bounds |V| at every sf (carrier = the windowed
    pre-aggregation, as in g_scc_event_types)."""
    parts = [f"WITH {_TYPE_GRAPH_SQL},\n"
             "deg AS (SELECT a AS id, COUNT(*) AS d FROM edges "
             "GROUP BY a),\n"
             "base AS (SELECT n.id, COALESCE(deg.d, 0) AS d\n"
             "         FROM n LEFT JOIN deg ON deg.id = n.id),\n"
             "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM n),\n"
             "r0 AS (SELECT id, d, 1.0 / (SELECT cnt FROM nn) AS rank "
             "FROM base)"]
    for i in range(n_iter):
        parts.append(f""",
dm{i} AS (SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{i} WHERE d = 0),
c{i} AS (SELECT e.b AS id, SUM(r.rank / r.d) AS in_mass
     FROM r{i} r JOIN edges e ON e.a = r.id WHERE r.d > 0
     GROUP BY e.b),
r{i + 1} AS (SELECT b.id, b.d,
     (1.0 - {alpha}) / (SELECT cnt FROM nn)
       + {alpha} * (COALESCE(c.in_mass, 0)
                    + (SELECT dmass FROM dm{i}) / (SELECT cnt FROM nn))
       AS rank
     FROM base b LEFT JOIN c{i} c ON c.id = b.id)""")
    parts.append(f"""
SELECT id AS node, ROUND(rank, 9) AS rank FROM r{n_iter}""")
    return "".join(parts)


def _ppr_types_sql(n_iter: int = 5, alpha: float = 0.85,
                   n_seeds: int = 2) -> str:
    """Unrolled personalized PageRank on the type graph: teleport AND
    dangling mass restart at the seed set (the ``n_seeds`` smallest
    type ids — deterministic); per-round expressions written in the
    engine's exact evaluation order so doubles agree to 9dp."""
    parts = [f"WITH {_TYPE_GRAPH_SQL},\n"
             f"seeds AS (SELECT id FROM n ORDER BY id LIMIT {n_seeds}),\n"
             "sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM seeds),\n"
             "deg AS (SELECT a AS id, COUNT(*) AS d FROM edges "
             "GROUP BY a),\n"
             "base AS (SELECT n.id, COALESCE(deg.d, 0) AS d,\n"
             "               n.id IN (SELECT id FROM seeds) AS is_seed\n"
             "         FROM n LEFT JOIN deg ON deg.id = n.id),\n"
             "r0 AS (SELECT id, d, is_seed,\n"
             "              CASE WHEN is_seed THEN 1.0 / (SELECT c FROM "
             "sc) ELSE 0.0 END AS rank\n"
             "       FROM base)"]
    for i in range(n_iter):
        parts.append(f""",
dm{i} AS (SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{i} WHERE d = 0),
c{i} AS (SELECT e.b AS id, SUM(r.rank / r.d) AS in_mass
     FROM r{i} r JOIN edges e ON e.a = r.id WHERE r.d > 0
     GROUP BY e.b),
r{i + 1} AS (SELECT b.id, b.d, b.is_seed,
     CASE WHEN b.is_seed
          THEN (1.0 - {alpha}) / (SELECT c FROM sc)
               + {alpha} * (SELECT dmass FROM dm{i}) / (SELECT c FROM sc)
          ELSE 0.0 END
       + {alpha} * COALESCE(c.in_mass, 0) AS rank
     FROM base b LEFT JOIN c{i} c ON c.id = b.id)""")
    parts.append(f"""
SELECT id AS node, ROUND(rank, 9) AS rank FROM r{n_iter}""")
    return "".join(parts)


@register("g_ppr_types", oracle=_ppr_types_sql(5),
          extra=True)  # promoted r10; demoted r12 (green r10-r11)
def g_ppr_types(spark, sf_dir):
    """Value-checked personalized PageRank (graph/algos.py
    personalized_pagerank, 5 rounds, seeds = the 2 smallest type ids)
    on the event-type graph — anchors g_ppr_top's rows-only semantics
    the same way g_pagerank_types anchors g_pagerank_top."""
    from graphraft_spark.graph.algos import personalized_pagerank
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    nodes = ev.select(F.col("event_type").alias("nodeId")).distinct()
    seeds = nodes.orderBy("nodeId").limit(2)
    pr = personalized_pagerank(nodes, edges, seeds, alpha=0.85, n_iter=5)
    return pr.select(F.col("nodeId").alias("node"),
                     F.round("rank", 9).alias("rank"))


def _kcore_types_sql(k: int = 2, rounds: int = 10) -> str:
    """Unrolled k-core peeling on the UNDIRECTED simple type graph:
    each round keeps edges whose BOTH endpoints have degree ≥ k in the
    previous round's frame.  Peeling removes ≥1 node per non-converged
    round, so ``rounds`` ≥ |type vocabulary| guarantees the unroll has
    converged — and converged rounds are idempotent, so overshooting is
    harmless.  Output is integer-exact (node, in-core degree)."""
    # Every per-round CTE is MATERIALIZED: DuckDB inlines plain CTEs at
    # each reference, and ue{i+1} references ue{i} three times (edge
    # frame + both endpoint filters) — un-materialized, the unroll
    # re-expands the whole prefix 3^rounds times (observed as a
    # too-many-open-files explosion on the base parquet view).
    parts = [f"WITH {_TYPE_GRAPH_SQL},\n"
             "ue0 AS MATERIALIZED (SELECT DISTINCT LEAST(a, b) AS a, "
             "GREATEST(a, b) AS b FROM edges WHERE a <> b)"]
    for i in range(rounds):
        parts.append(f""",
kp{i} AS MATERIALIZED (SELECT nn FROM (
        SELECT nn, COUNT(*) AS deg FROM (
            SELECT a AS nn FROM ue{i} UNION ALL
            SELECT b AS nn FROM ue{i})
        GROUP BY nn) WHERE deg >= {k}),
ue{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM ue{i} e
     JOIN kp{i} ka ON ka.nn = e.a
     JOIN kp{i} kb ON kb.nn = e.b)""")
    parts.append(f"""
SELECT nn AS n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS nn FROM ue{rounds} UNION ALL
    SELECT b AS nn FROM ue{rounds})
GROUP BY nn""")
    return "".join(parts)


@register("g_kcore_types", oracle=_kcore_types_sql(2),
          extra=True)  # promoted r10; demoted r13 (eighth wave)
def g_kcore_types(spark, sf_dir):
    """Value-checked 2-core (graph/algos.py k_core) of the undirected
    event-type graph — integer-exact (node, in-core degree), anchoring
    g_kcore's rows-only big-graph run with a hash-matched twin."""
    from graphraft_spark.graph.algos import k_core
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    out = k_core(edges, k=2)
    return out.select(F.col("n"), F.col("deg").cast("bigint").alias("deg"))


@register("g_pagerank_types",  # promoted r10; demoted r13 (eighth wave)
          oracle=_pagerank_types_sql(5), extra=True)
def g_pagerank_types(spark, sf_dir):
    """Value-checked PageRank (graph/algos.py pagerank, 5 rounds,
    damping 0.85, uniform dangling redistribution) on the event-type
    transition graph — completes the iterative-float value-oracle set
    next to g_hits_top and g_betweenness_types; the big-graph
    g_pagerank_top stays rows-only (top-20 float rank) with its
    semantics pinned here plus the 1e-12 numpy-parity suite."""
    from graphraft_spark.graph.algos import pagerank
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    nodes = ev.select(F.col("event_type").alias("nodeId")).distinct()
    pr = pagerank(nodes, edges, alpha=0.85, n_iter=5)
    return pr.select(F.col("nodeId").alias("node"),
                     F.round("rank", 9).alias("rank"))


_TYPE_PAIRS_CTE = """    SELECT a AS c, b AS x, CAST(COUNT(*) AS DOUBLE) AS w
    FROM (SELECT event_type AS a,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS b
          FROM events) s
    WHERE b IS NOT NULL AND a <> b
    GROUP BY a, b"""


def _sgns_types_sql(dim: int = 4, epochs: int = 2, lr: float = 0.05,
                    negatives: int = 2, seed: str = "emb0") -> str:
    """SGNS replay over the event-type transition pairs — the shared
    generator (registry/_sql_fragments.py sgns_replay_sql, see its
    docstring for the evidence argument) instantiated with the type
    pair CTE.  The generated string is byte-identical to the inline
    generator this delegates from (checked at the refactor)."""
    from graphraft_spark.registry._sql_fragments import sgns_replay_sql

    return sgns_replay_sql(_TYPE_PAIRS_CTE, dim, epochs, lr, negatives,
                           seed)


@register("g_type_embeddings",  # demoted r12: the trainer is now
          # graded via the fuller word2vec recipe (t_word_embeddings_*)
          oracle=_sgns_types_sql(4, 2, 0.05, 2), extra=True)
def g_type_embeddings(spark, sf_dir):
    """Value-checked distributed SGNS (graph/embeddings.py train_sgns,
    dim=4, 2 epochs, 2 hash-drawn negative slots, lr=0.05) over the
    event-type co-occurrence pairs (consecutive transitions per user,
    count-weighted) — the in-engine embedding trainer hash-matched
    against a full unrolled-SQL replay, extending the every-iterative-
    algorithm-value-checked line (PageRank/PPR/k-core/HITS/Brandes) to
    the newest one.  Output is (node, pos, val) — the embedding table
    flattened, values rounded 6dp."""
    from pyspark.sql import Window

    from graphraft_spark.graph.embeddings import train_sgns

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull()
                     & (F.col("nxt") != F.col("event_type")))
             .groupBy(F.col("event_type").alias("center"),
                      F.col("nxt").alias("context"))
             .agg(F.count("*").alias("cnt")))
    emb = train_sgns(pairs, dim=4, epochs=2, lr=0.05, negatives=2)
    return (emb.select("node", F.posexplode("emb").alias("pos", "val"))
            .select("node", F.col("pos").cast("int").alias("pos"),
                    F.round("val", 6).alias("val")))


_EMBED_KNN_SQL = _sgns_types_sql(4, 2, 0.05, 2).rsplit(
    "\nSELECT e.node", 1)[0] + """,
sims AS (
    SELECT a.node AS src, b.node AS dst,
           ROUND(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 9) AS cos
    FROM emb2 a JOIN emb2 b ON a.node <> b.node
)
SELECT src, dst, ROUND(cos, 6) AS cos, CAST(rn AS INT) AS rn
FROM (SELECT src, dst, cos,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cos DESC, dst) AS rn
      FROM sims)
WHERE rn <= 3"""


@register("g_embed_knn", extra=True, oracle=_EMBED_KNN_SQL)
def g_embed_knn(spark, sf_dir):
    """Train → search, end-to-end and oracle-backed: the SGNS
    embeddings from g_type_embeddings feed a cosine top-3
    similar-types search (the composition a user runs after training —
    embeddings into the ANN surface).  Ranking is on cos ROUNDED to
    9dp on BOTH sides, so sub-ulp float drift between engines cannot
    flip a rank; the trained vectors are not unit-norm, hence the full
    cosine, not the dot shortcut."""
    from pyspark.sql import Window

    from graphraft_spark.graph.embeddings import _dot, train_sgns

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull()
                     & (F.col("nxt") != F.col("event_type")))
             .groupBy(F.col("event_type").alias("center"),
                      F.col("nxt").alias("context"))
             .agg(F.count("*").alias("cnt")))
    emb = train_sgns(pairs, dim=4, epochs=2, lr=0.05, negatives=2)
    a = emb.select(F.col("node").alias("src"), F.col("emb").alias("ea"))
    b = emb.select(F.col("node").alias("dst"), F.col("emb").alias("eb"))
    cos = F.round(
        _dot(F.col("ea"), F.col("eb"))
        / (F.sqrt(_dot(F.col("ea"), F.col("ea")))
           * F.sqrt(_dot(F.col("eb"), F.col("eb")))), 9)
    rank_w = Window.partitionBy("src").orderBy(F.desc("cos"),
                                               F.asc("dst"))
    # broadcast cross-score (the brute-force KNN shape, BNLJ-allowlisted)
    # — the embedding table is vocab-sized, never corpus-sized
    return (a.crossJoin(F.broadcast(b))
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst", cos.alias("cos"))
            .withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") <= 3)
            .select("src", "dst", F.round("cos", 6).alias("cos"),
                    F.col("rn").cast("int").alias("rn")))


@register(
    "g_bfs_distances", extra=True,
    oracle="""
WITH RECURSIVE seq AS (
    SELECT event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b
    FROM events
),
edges AS (
    SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL AND a <> b
),
n AS (SELECT DISTINCT event_type AS id FROM events),
walk(source, node, dist) AS (
    SELECT id, id, 0 FROM n
    UNION
    SELECT w.source, e.b, w.dist + 1
    FROM walk w JOIN edges e ON e.a = w.node
    WHERE w.dist < 20
),
best AS (
    SELECT source, node, CAST(MIN(dist) AS INT) AS dist
    FROM walk GROUP BY source, node
)
SELECT source, node, dist FROM best
""")
def g_bfs_distances(spark, sf_dir):
    """Multi-source BFS distances (graph/algos.py bfs_distances) over
    the event-type transition graph, every type a source — hop
    distances between behavioral states.  Level-synchronous frontier
    joins (all sources advance together); the oracle replays it as a
    recursive walk + MIN(dist) per pair (tractable on the small type
    graph; at corpus scale the carrier is the windowed pre-aggregation,
    as in g_scc_event_types)."""
    from graphraft_spark.graph.algos import bfs_distances
    from pyspark.sql import Window

    ev = load_pq(spark, f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("event_type").alias("src"),
                    F.lead("event_type").over(w).alias("dst"))
    edges = (seq.filter(F.col("dst").isNotNull()
                        & (F.col("src") != F.col("dst")))
             .distinct())
    nodes = ev.select(F.col("event_type").alias("id")).distinct()
    out = bfs_distances(nodes, edges, nodes.select(F.col("id").alias("s")))
    return out.select("source", "node", F.col("dist").cast("int")
                      .alias("dist"))
