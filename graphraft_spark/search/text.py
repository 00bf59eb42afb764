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
                         nfc: bool | None = False,
                         knn_via: str = "brute",
                         knn_opts: dict | None = None) -> "DataFrame":
    """Set-based C1+C2 for MANY entities at once (the batch shape of
    _match_labeled_entities, ner.py:95-120): one normalized-equality
    join for fulltext hits; entities with zero hits fall back to vector
    KNN top-1 over node name embeddings (when embedding columns are
    supplied).  Returns (qid, entity, name, matched_by).

    ``nfc=None`` auto-enables true Unicode NFC matching when the graph's
    names contain non-ASCII (the reference always NFC-normalizes,
    ner.py:111-113; we keep it off ASCII data so oracle SQL stays
    expressible — SURVEY §7.7).

    ``knn_via`` routes the vector fallback:

    - ``"brute"`` (default, exact): broadcast the unmatched entities
      (tiny by contract — they are the zero-hit remainder of a question
      batch) against every node name embedding.  Right up to corpora
      where a full name scan per batch is acceptable.
    - ``"srp"``: SRP-LSH multiprobe (ops/similarity.py:srp_lsh_topk)
      — hashes names into 2^bits buckets and probes only the entity's
      bucket + Hamming-1 neighbors.  Approximate (an empty probe set
      yields no fallback row for that entity).  ``knn_opts``:
      ``bits`` (default 8), ``seed``.
    - ``"ivf"``: partition-pruned probe of a PRE-BUILT IVF index over
      (name, embedding) rows (ops/similarity.py:ivf_search_pruned) —
      the 100 TB shape: per-entity scan cost is nprobe/k of the corpus.
      ``knn_opts``: ``index_dir`` (required; build with
      ivf_assign + save_ivf_index using id_col='name'), ``nprobe``.
    """
    if nfc is None:
        nfc = has_non_ascii_names(graph.nodes)
    from pyspark.sql import Window

    from graphraft_spark.search.vector import dot_col

    opts = dict(knn_opts or {})
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
    # tiny by contract (zero-hit remainder), but after two joins its
    # stats are opaque to the planner — broadcast explicitly so the
    # fallback never shuffles the corpus side.
    missing = F.broadcast(
        e.join(hits.select("qid", "entity").distinct(),
               ["qid", "entity"], "left_anti")
        .join(entities.select("qid", "entity", entity_emb_col),
              ["qid", "entity"]))
    if knn_via == "brute":
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
    # ANN tiers share a surrogate struct key so (qid, entity) survives
    # the single-key contract of the similarity operators.
    q = missing.select(F.struct("qid", "entity").alias("ekey"),
                       F.col(entity_emb_col).alias("q_emb"))
    if knn_via == "srp":
        from graphraft_spark.ops.similarity import srp_lsh_topk

        first = graph.nodes.select(name_emb_col).first()
        dim = len(first[0]) if first else 0
        top = srp_lsh_topk(
            n.select("name", name_emb_col), q, k=1, dim=dim,
            bits=opts.get("bits", 8), seed=opts.get("seed", 7),
            id_col="name", emb_col=name_emb_col,
            qid_col="ekey", qemb_col="q_emb")
    elif knn_via == "ivf":
        from graphraft_spark.ops.similarity import ivf_search_pruned

        # the saved index has its own column names (id/emb as written
        # by save_ivf_index), independent of the graph's name_emb_col
        top = ivf_search_pruned(
            entities.sparkSession, opts["index_dir"], q, k=1,
            nprobe=opts.get("nprobe", 2), qid_col="ekey",
            qemb_col="q_emb", id_col=opts.get("id_col", "name"),
            emb_col=opts.get("emb_col", "embedding"))
    else:
        raise ValueError(f"unknown knn_via {knn_via!r} "
                         "(expected 'brute' | 'srp' | 'ivf')")
    id_out = "name" if knn_via == "srp" else opts.get("id_col", "name")
    fallback = top.select(
        F.col("ekey.qid").alias("qid"), F.col("ekey.entity").alias("entity"),
        F.col(id_out).alias("name"), F.lit("vector").alias("matched_by"))
    return hits.unionByName(fallback)


def fuzzy_match_entities(nodes: DataFrame, entities: DataFrame,
                         max_dist: int = 2, label: str | None = None,
                         qid_col: str = "qid",
                         entity_col: str = "entity",
                         nfc: bool = False) -> DataFrame:
    """C1 fuzzy extension: every node name within Levenshtein distance
    ``max_dist`` of each entity, under the same normalization as
    :func:`fulltext_match` — the typo-tolerant tier between exact
    fulltext equality and the vector fallback (the reference's NER
    output is LLM-generated and misspells entities; ner.py:95-120 then
    finds nothing and pays the vector search).

    Candidate generation is EXACT by the segment pigeonhole
    (PassJoin, Li et al. VLDB 2011): split the normalized entity into
    ``max_dist+1`` contiguous segments — a name within distance
    ``max_dist`` must contain at least one segment verbatim, so the
    substring pre-filter loses nothing.  The (tiny, broadcast)
    entity-segment side scans the corpus once — the same BNLJ shape as
    the KNN fallback — and native ``levenshtein`` verifies (codegen).
    Entities shorter than ``max_dist+1`` chars yield empty segments
    (contains('') = always), degrading to verify-everything: still
    correct, just unpruned.

    Returns (qid, entity, name, dist), distinct."""
    nseg = max_dist + 1
    base = entities.select(
        F.col(qid_col).alias("qid"), F.col(entity_col).alias("entity"),
        norm_col(F.col(entity_col), nfc).alias("_e"))
    eN = F.col("_e")
    L = F.length(eN)
    segs = F.transform(
        F.sequence(F.lit(0), F.lit(max_dist)),
        lambda i: eN.substr(
            (F.floor(i * L / nseg) + 1).cast("int"),
            (F.floor((i + 1) * L / nseg)
             - F.floor(i * L / nseg)).cast("int")))
    ent = base.select("qid", "entity", "_e",
                      F.explode(segs).alias("_seg"))

    df = nodes
    if label is not None and label != "_Entity_":
        df = df.filter(F.col("label") == label)
    names = df.select("name", norm_col(F.col("name"), nfc).alias("_n")) \
        .distinct()
    return (
        names.join(F.broadcast(ent), F.col("_n").contains(F.col("_seg")))
        # length band is a necessary condition — prunes before the DP
        .filter(F.abs(F.length("_n") - F.length("_e")) <= max_dist)
        .filter(F.levenshtein("_n", "_e") <= max_dist)
        .select("qid", "entity", "name",
                F.levenshtein("_n", "_e").alias("dist"))
        .distinct()
    )
