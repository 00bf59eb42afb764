"""Fulltext / normalized entity matching (reference ner.py:95-120).

The reference's "fulltext search" is a Neo4j fulltext-index probe whose
results are then *exact-matched* after case folding + Unicode NFC:
``normalize(lower(name)) = normalize(lower($string))`` (ner.py:111-113).
The index is only a candidate generator, so the exact semantics is a
normalized-equality join — which is what we run, letting Catalyst pick
a broadcast hash join for the tiny entity list.

Unicode NFC has no native Spark expression; ASCII-only data needs only
``lower(trim(...))``.  ``nfc_normalize`` upgrades matching to true NFC
via an Arrow-batched pandas UDF when requested (kept off the default
path so DuckDB-oracle comparisons stay expressible).
"""

from __future__ import annotations

import pandas as pd

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphraft_spark.graph.model import PropertyGraph


def norm_col(c: Column, nfc: bool = False) -> Column:
    if nfc:
        return nfc_normalize(F.lower(F.trim(c)))
    return F.lower(F.trim(c))


# pandas_udf construction needs an active SparkSession; build lazily.
_NFC_UDF = None


def nfc_normalize(s: Column) -> Column:
    global _NFC_UDF
    if _NFC_UDF is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(col: pd.Series) -> pd.Series:
            import unicodedata

            return col.map(lambda x: None if x is None
                           else unicodedata.normalize("NFC", x))

        _NFC_UDF = _nfc
    return _NFC_UDF(s)


def has_non_ascii_names(nodes: DataFrame) -> bool:
    """Cheap auto-NFC probe: True when any node name contains non-ASCII
    (UTF-8 byte length != char length).  One early-exit scan; callers
    cache the answer per graph."""
    return (nodes.filter(F.octet_length("name") != F.length("name"))
            .limit(1).count() > 0)


def fulltext_match(nodes: DataFrame, query_string: str,
                   label: str | None = None, nfc: bool = False) -> DataFrame:
    """C1: all node names equal to ``query_string`` under normalization,
    optionally restricted to a label ('_Entity_' = no restriction,
    ner.py:95-114).  Returns DISTINCT names (the reference extends
    ``node_names`` with every hit)."""
    df = nodes
    if label is not None and label != "_Entity_":
        df = df.filter(F.col("label") == label)
    return (
        df.filter(norm_col(F.col("name"), nfc) == norm_col(F.lit(query_string), nfc))
        .select("name")
        .distinct()
    )


def match_entities(spark: SparkSession, graph: PropertyGraph,
                   entities: Sequence[tuple[str, str]],
                   encoder=None, k: int = 100, nfc: bool = False) -> list[str]:
    """C1+C2: the reference's _match_labeled_entities loop (ner.py:95-120):
    per (label, string) entity, fulltext-match; on zero hits fall back to
    vector search over name embeddings, LIMIT 1.

    ``encoder`` is the pluggable text-embedding seam (the reference calls
    genai.vector.encode/OpenAI); tests pass a deterministic function.
    Entity lists are tiny (1-4 per question) so this drives one small
    Spark job per entity — batch pipelines should use the set-based
    operators directly.
    """
    names: list[str] = []
    for label, string in entities:
        hits = [r["name"] for r in
                fulltext_match(graph.nodes, string, label, nfc).collect()]
        if hits:
            names.extend(hits)
            continue
        if encoder is None:
            continue
        from graphraft_spark.search.vector import knn

        emb = encoder(string)
        cand = graph.nodes if label in (None, "_Entity_") else (
            graph.nodes.filter(F.col("label") == label))
        top = knn(cand, "nameEmbedding", emb, k=k).limit(1)
        names.extend(r["name"] for r in top.select("name").collect())
    return names


def batch_match_entities(graph, entities: "DataFrame",
                         name_emb_col: str | None = None,
                         entity_emb_col: str | None = None,
                         nfc: bool | None = False) -> "DataFrame":
    """Set-based C1+C2 for MANY entities at once (the batch shape of
    _match_labeled_entities, ner.py:95-120): one normalized-equality
    join for fulltext hits; entities with zero hits fall back to vector
    KNN top-1 over node name embeddings (when embedding columns are
    supplied).  Returns (qid, entity, name, matched_by).

    ``nfc=None`` auto-enables true Unicode NFC matching when the graph's
    names contain non-ASCII (the reference always NFC-normalizes,
    ner.py:111-113; we keep it off ASCII data so oracle SQL stays
    expressible — SURVEY §7.7)."""
    if nfc is None:
        nfc = has_non_ascii_names(graph.nodes)
    from pyspark.sql import Window

    from graphraft_spark.search.vector import dot_col

    e = entities.select("qid", "entity",
                        norm_col(F.col("entity"), nfc).alias("k"))
    n = graph.nodes.select(
        "name", norm_col(F.col("name"), nfc).alias("k"),
        *( [F.col(name_emb_col)] if name_emb_col else [] ))
    hits = (F.broadcast(e).join(n.select("name", "k"), "k")
            .select("qid", "entity", "name",
                    F.lit("fulltext").alias("matched_by"))
            .distinct())
    if not (name_emb_col and entity_emb_col):
        return hits
    missing = (e.join(hits.select("qid", "entity").distinct(),
                      ["qid", "entity"], "left_anti")
               .join(entities.select("qid", "entity", entity_emb_col),
                     ["qid", "entity"]))
    scored = (missing.crossJoin(n.select("name", name_emb_col))
              .withColumn("sim", dot_col(F.col(entity_emb_col),
                                         F.col(name_emb_col))))
    w = Window.partitionBy("qid", "entity").orderBy(
        F.desc("sim"), F.asc("name"))
    fallback = (scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("qid", "entity", "name",
                        F.lit("vector").alias("matched_by")))
    return hits.unionByName(fallback)
