"""Dataset/dataflow operators (SURVEY §2.E) as oracle-checked queries.

A qa_with_cypher_queries-shaped table is derived per customer from
orders: parallel arrays (queries, hits, num_results) ordered by
orderkey — the exact shape llm1.py:53-66 sorts and gates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.data import (
    best_label_is_good,
    head_n,
    power_law_rank_sample,
    repair_queries,
    sort_parallel_arrays,
)
from graphraft_spark.registry import register
from graphraft_spark.sources.pq_cache import load_pq

_QA_SQL = """
qa AS (
    SELECT CAST(o_custkey AS BIGINT) AS id,
           list(CAST(o_orderkey AS VARCHAR) ORDER BY o_orderkey) AS queries,
           list(o_orderkey % 5 ORDER BY o_orderkey) AS hits,
           list(o_orderkey % 11 + 1 ORDER BY o_orderkey) AS num_results
    FROM orders GROUP BY o_custkey
)"""

_SORTED_SQL = """
sorted AS (
    SELECT id, queries, list_sort(list_transform(
        range(1, len(queries) + 1),
        i -> {'k1': -hits[i], 'k2': num_results[i], 'k3': i,
              'q': queries[i]})) AS s
    FROM qa
)"""


def _qa(spark, sf_dir):
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    arr = lambda c: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct(F.col("o_orderkey").alias("k"),
                                             c.alias("v")))),
        lambda x: x["v"])
    return (
        o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
        .agg(
            arr(F.col("o_orderkey").cast("string")).alias("queries"),
            arr(F.col("o_orderkey") % 5).alias("hits"),
            arr(F.col("o_orderkey") % 11 + 1).alias("num_results"),
        )
    )


def _sorted(spark, sf_dir):
    qa = _qa(spark, sf_dir)
    return qa.withColumn(
        "s", sort_parallel_arrays(F.col("queries"), F.col("hits"),
                                  F.col("num_results")))


@register(
    "e_parallel_sort", extra=True,  # demoted r13 (eighth wave)
    oracle=f"""
WITH {_QA_SQL.strip()},
{_SORTED_SQL.strip()}
SELECT id, s[1].q AS best_query, -s[1].k1 AS best_hits,
       s[1].k2 AS best_num_results,
       array_to_string(list_transform(s, x -> x.q), '|') AS sorted_queries
FROM sorted
""")
def e_parallel_sort(spark, sf_dir):
    """E5: intra-row parallel-array sort by (hits DESC, num_results ASC),
    stable (llm1.py:53-58) — one codegen'd expression per row, no
    explode/shuffle.  Sorted array serialized '|'-joined (order
    preserved) so the driver canonicalizer sees scalars."""
    return _sorted(spark, sf_dir).select(
        "id",
        F.element_at("s", 1)["query"].alias("best_query"),
        F.element_at("s", 1)["hits"].alias("best_hits"),
        F.element_at("s", 1)["num_results"].alias("best_num_results"),
        F.concat_ws("|", F.transform("s", lambda x: x["query"]))
        .alias("sorted_queries"),
    )


@register(
    "e_quality_gate", extra=True,
    oracle=f"""
WITH {_QA_SQL.strip()},
{_SORTED_SQL.strip()}
SELECT id, s[1].q AS best_query, -s[1].k1 AS best_hits
FROM sorted
WHERE len(s) > 0 AND s[1].k2 > 0 AND (id % 4 + 1) > 0
      AND CAST(-s[1].k1 AS DOUBLE) / s[1].k2 >= 0.1
      AND CAST(-s[1].k1 AS DOUBLE) / (id % 4 + 1) >= 1.0
""")
def e_quality_gate(spark, sf_dir):
    """E6: best_label_is_good gate (llm1.py:61-66): precision ≥ 0.1 and
    recall ≥ 1.0 on the best-sorted query; n_answers stand-in = id%4+1."""
    df = _sorted(spark, sf_dir)
    gate = best_label_is_good(F.col("s"), (F.col("id") % 4 + 1))
    return df.filter(gate).select(
        "id",
        F.element_at("s", 1)["query"].alias("best_query"),
        F.element_at("s", 1)["hits"].alias("best_hits"),
    )


@register(
    "e_rank_sample", extra=True,  # demoted r12 (green r1-r11)
    oracle=f"""
WITH {_QA_SQL.strip()},
sampled AS (
    SELECT id, queries,
           list_sort(list_distinct(list_transform(
               range(1, 6),
               i -> LEAST(len(queries),
                          CAST(floor(pow(((id * 7919 + i * 104659) % 104729)
                                         / 104729.0, 10.0)
                                     * len(queries)) AS INT) + 1)))) AS ranks
    FROM qa
)
SELECT id, array_to_string(ranks, '|') AS ranks,
       array_to_string(list_transform(ranks, r -> queries[r]), '|')
           AS top_queries
FROM sampled
""")
def e_rank_sample(spark, sf_dir):
    """E7: power-law rank sampling (alpha=0.1, 5 draws) for LLM2
    training-query selection (generate_training_data_llm2.ipynb cell 5),
    with a deterministic modular-arithmetic u so it is oracle-checkable
    (SURVEY §7.8: nondeterminism quarantine)."""
    qa = _qa(spark, sf_dir)
    ranks = power_law_rank_sample(F.size("queries"), F.col("id"))
    return (
        qa.withColumn("ranks", ranks)
        .select("id",
                F.concat_ws("|", F.transform(
                    "ranks", lambda r: r.cast("string"))).alias("ranks"),
                F.concat_ws("|", F.transform(
                    "ranks", lambda r: F.element_at(F.col("queries"), r)))
                .alias("top_queries"))
    )


@register(
    "e_repair_head", extra=True,
    oracle="""
WITH qa AS (
    SELECT CAST(o_custkey AS BIGINT) AS id,
           list('MATCH (x) RETURN x WHERE ' || CAST(o_orderkey AS VARCHAR)
                ORDER BY o_orderkey) AS queries
    FROM orders GROUP BY o_custkey
)
SELECT id,
       array_to_string(list_transform(queries,
           q -> replace(q, 'RETURN x', 'RETURN DISTINCT x')), '|')
           AS repaired
FROM qa ORDER BY id LIMIT 50
""")
def e_repair_head(spark, sf_dir):
    """E8+E3: string repair pass over query arrays (RETURN x → RETURN
    DISTINCT x, notebook cell 7) + head-N on a defined order."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    qa = (
        o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col("o_orderkey").alias("k"),
                F.concat(F.lit("MATCH (x) RETURN x WHERE "),
                         F.col("o_orderkey").cast("string")).alias("v")))),
            lambda x: x["v"]).alias("queries"))
    )
    out = qa.select(
        "id",
        F.concat_ws("|", repair_queries(F.col("queries"))).alias("repaired"))
    return head_n(out, 50, [F.col("id")])


@register(
    "e_embedding_join", extra=True,  # demoted r7: plain equi-join shape; slot to d_semantic_dedup
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS id, COUNT(*) AS n_orders,
       CAST(len(e.embedding) AS INT) AS emb_dim,
       ROUND(list_sum(list_transform(e.embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS emb_sq_norm
FROM orders o JOIN embeddings e ON e.vec_id = o_custkey
WHERE o_custkey < 100
GROUP BY o_custkey, e.embedding
""")
def e_embedding_join(spark, sf_dir):
    """E9: attach q_emb by question id (the reference loads a .pt dict and
    maps it row-wise, notebook cell 8) — a plain equi-join, broadcast by
    Catalyst when the embedding side is small.  The joined vector is
    summarized as (dim, double-precision squared L2 norm) — exact in
    both engines via in-order double folds — because raw float arrays
    are not driver-canonicalizable."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    e = load_pq(spark, f"{sf_dir}/embeddings.parquet")
    return (
        o.filter(F.col("o_custkey") < 100)
        .join(e, F.col("vec_id") == F.col("o_custkey"))
        .groupBy(F.col("o_custkey").cast("bigint").alias("id"), "embedding")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "id", "n_orders",
            F.size("embedding").alias("emb_dim"),
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double")),
                4).alias("emb_sq_norm"))
    )


@register(
    "e_map_filter_rename", extra=True,  # demoted: trivial projections; primary slot given to d_span_dedup (family stays covered by e_repair_head/e_parallel_sort)
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS question_id,
       COUNT(*) AS n_answers,
       array_to_string(list(o_orderkey ORDER BY o_orderkey), '|')
           AS answer_ids
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_custkey
HAVING COUNT(*) > 0
""")
def e_map_filter_rename(spark, sf_dir):
    """E1+E2+E4: row map (computed column), predicate filter (non-empty
    answers), rename — the .map/.filter/.rename_column trio of the HF
    pipelines (llm1.py:122,170; llm2.py:139,218) as one projection."""
    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    qa = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_answers"),
             F.concat_ws("|", F.transform(
                 F.sort_array(F.collect_list("o_orderkey")),
                 lambda x: x.cast("string"))).alias("answer_ids"))
        .filter(F.col("n_answers") > 0)                      # E2
        .withColumnRenamed("o_custkey", "question_id")       # E4
        .withColumn("question_id", F.col("question_id").cast("bigint"))
    )
    return qa.select("question_id", "n_answers", "answer_ids")


_H60_SQL = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"


@register(
    "e_hash_split", extra=True,  # promoted r11; demoted r13 (eighth wave)
    oracle=f"""
SELECT o_orderkey,
       CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'valid'
            ELSE 'test' END AS split
FROM (
    SELECT o_orderkey,
           {_H60_SQL.format(s="'split' || CAST(o_orderkey AS VARCHAR)")}
               % 10 AS b
    FROM orders
)
""")
def e_hash_split(spark, sf_dir):
    """Deterministic train/valid/test split (8/1/1) by portable key
    hash — stable across runs, partitionings, and engines."""
    from graphraft_spark.data.ops import hash_split

    o = load_pq(spark, f"{sf_dir}/orders.parquet")
    return hash_split(o.select("o_orderkey"), "o_orderkey").select(
        "o_orderkey", "split")


@register(
    "r_negative_samples", extra=True,
    oracle=f"""
WITH qids AS (SELECT CAST(q.qid AS BIGINT) AS qid
              FROM (VALUES (0),(1),(2),(3),(4)) q(qid)),
cands AS (
    SELECT qid, CAST(c_custkey AS BIGINT) + 1000000000 AS nodeId,
           c_nationkey
    FROM customer, qids
),
nonpos AS (
    SELECT qid, nodeId FROM cands
    WHERE NOT (c_nationkey = qid OR c_nationkey = qid + 5)
)
SELECT qid, nodeId, CAST(neg_rank AS INT) AS neg_rank FROM (
    SELECT qid, nodeId,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
               {_H60_SQL.format(
                   s="'neg' || CAST(qid AS VARCHAR) || '#' || "
                     "CAST(nodeId AS VARCHAR)")} ASC, nodeId) AS neg_rank
    FROM nonpos
) WHERE neg_rank <= 5
""")
def r_negative_samples(spark, sf_dir):
    """Contrastive-training negative sampling: per question, 5 uniform
    reproducible non-answer candidates (portable hash ranking) — the
    hard-negative-mining baseline of a training-data pipeline."""
    from graphraft_spark.data.ops import negative_samples

    cust = load_pq(spark, f"{sf_dir}/customer.parquet")
    qids = spark.createDataFrame([(i,) for i in range(5)], "qid bigint")
    cands = (cust.crossJoin(F.broadcast(qids))
             .select("qid", (F.col("c_custkey").cast("bigint")
                             + 1_000_000_000).alias("nodeId"),
                     "c_nationkey"))
    positives = cands.filter((F.col("c_nationkey") == F.col("qid"))
                             | (F.col("c_nationkey") == F.col("qid") + 5))
    out = negative_samples(cands.drop("c_nationkey"),
                           positives, k=5)
    return out.select("qid", "nodeId",
                      F.col("neg_rank").cast("int").alias("neg_rank"))


@register(
    "e_corpus_diff", extra=True,
    oracle="""
SELECT status, COUNT(*) AS n
FROM (
    SELECT CASE
        WHEN a.doc_id IS NULL THEN 'added'
        WHEN b.doc_id IS NULL THEN 'removed'
        WHEN md5(a.text) <> md5(b.text) THEN 'changed'
        ELSE 'unchanged' END AS status
    FROM (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0) a
    FULL OUTER JOIN (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
                   AS text
        FROM documents WHERE doc_id % 11 <> 0
    ) b ON a.doc_id = b.doc_id
)
GROUP BY status
""")
def e_corpus_diff(spark, sf_dir):
    """Corpus snapshot diff — the dataset-versioning primitive: one
    full-outer join on the id with a content-hash comparison classifies
    every document as added/removed/changed/unchanged.  Both snapshots
    here derive deterministically from the documents table (drop 1/7th
    for the old snapshot, drop 1/11th and append ' v2' to 1/5th for the
    new), so the oracle checks the classification itself.  One id-keyed
    shuffle; at scale both sides bucket by id and the join is
    shuffle-free."""
    docs = load_pq(spark, f"{sf_dir}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5("text").alias("h_old"))
    new = (docs.filter(F.col("doc_id") % 11 != 0)
           .select("doc_id",
                   F.md5(F.when(F.col("doc_id") % 5 == 0,
                                F.concat("text", F.lit(" v2")))
                         .otherwise(F.col("text"))).alias("h_new")))
    return (
        old.join(new, "doc_id", "full_outer")
        .select(
            F.when(F.col("h_old").isNull(), "added")
            .when(F.col("h_new").isNull(), "removed")
            .when(F.col("h_old") != F.col("h_new"), "changed")
            .otherwise("unchanged").alias("status"))
        .groupBy("status").agg(F.count("*").alias("n"))
    )


@register(
    "e_corpus_expectations", extra=True,
    oracle="""
SELECT 'doc_id_not_null' AS expectation,
       COUNT(*) FILTER (doc_id IS NULL) AS violations, COUNT(*) AS total
FROM documents
UNION ALL
SELECT 'doc_id_unique',
       (SELECT COUNT(*) FROM (
           SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1
       )), COUNT(*)
FROM documents
UNION ALL
SELECT 'text_nonempty', COUNT(*) FILTER (trim(text) = ''), COUNT(*)
FROM documents
UNION ALL
SELECT 'lang_in_domain',
       COUNT(*) FILTER (lang NOT IN ('en', 'de', 'es', 'fr', 'zh')),
       COUNT(*)
FROM documents
UNION ALL
SELECT 'n_chars_matches_text',
       COUNT(*) FILTER (n_chars <> length(text)), COUNT(*)
FROM documents
""")
def e_corpus_expectations(spark, sf_dir):
    """Deequ-style expectation suite over the corpus in ONE pass:
    conditional counts fold every constraint (null, uniqueness via a
    grouped-duplicate subcount, domain membership, derived-column
    consistency) into a single scan + tiny aggregate; the uniqueness
    check is the only extra shuffle and it aggregates before counting.
    The oracle recomputes each violation count."""
    docs = load_pq(spark, f"{sf_dir}/documents.parquet")
    total = docs.count()
    one_pass = docs.agg(
        F.count(F.when(F.col("doc_id").isNull(), 1)).alias("nulls"),
        F.count(F.when(F.trim("text") == "", 1)).alias("empty"),
        F.count(F.when(~F.col("lang").isin(
            "en", "de", "es", "fr", "zh"), 1)).alias("lang"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1))
        .alias("chars"),
    ).first()
    dups = (docs.groupBy("doc_id").agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1).count())
    rows = [
        ("doc_id_not_null", one_pass["nulls"]),
        ("doc_id_unique", dups),
        ("text_nonempty", one_pass["empty"]),
        ("lang_in_domain", one_pass["lang"]),
        ("n_chars_matches_text", one_pass["chars"]),
    ]
    return spark.createDataFrame(
        [(n, v, total) for n, v in rows],
        "expectation string, violations bigint, total bigint")


_WS_DEN = str(2**59)


@register(
    "e_weighted_sample", extra=True,
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         ln((('0x' || substr(md5('ws0' || CAST(doc_id AS VARCHAR)),
              1, 15))::BIGINT % {_WS_DEN} + 0.5) / {_WS_DEN}.0)
         / CAST(n_chars AS DOUBLE) AS sample_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, ROUND(sample_key, 9) AS sample_key
FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 100
""")
def e_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential keys over the portable hash): 100 documents
    drawn proportionally to n_chars, reproducible across engines — the
    stochastic-selection step for DSIR-weighted data curation.  One
    codegen projection + TakeOrdered."""
    from graphraft_spark.data.ops import weighted_sample

    d = load_pq(spark, f"{sf_dir}/documents.parquet") \
        .select("doc_id", "n_chars")
    out = weighted_sample(d, "n_chars", n=100, key_col="doc_id")
    return out.select("doc_id", F.round("sample_key", 9)
                      .alias("sample_key"))


@register(
    "e_weighted_sample_grouped", extra=True,
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source,
         ln((('0x' || substr(md5('ws0' || CAST(doc_id AS VARCHAR)),
              1, 15))::BIGINT % {_WS_DEN} + 0.5) / {_WS_DEN}.0)
         / CAST(n_chars AS DOUBLE) AS sample_key
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, source, sample_key,
         row_number() OVER (PARTITION BY source
                            ORDER BY sample_key DESC, doc_id)
             AS sample_rank
  FROM keyed
)
SELECT doc_id, source, ROUND(sample_key, 9) AS sample_key,
       CAST(sample_rank AS INT) AS sample_rank
FROM ranked WHERE sample_rank <= 25
""")
def e_weighted_sample_grouped(spark, sf_dir):
    """Stratified weighted sampling: an independent 25-row
    length-proportional draw per source — window top-n per group, no
    global sort."""
    from graphraft_spark.data.ops import weighted_sample_per_group

    d = load_pq(spark, f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "n_chars")
    out = weighted_sample_per_group(d, "n_chars", n=25,
                                    group_col="source")
    return out.select("doc_id", "source",
                      F.round("sample_key", 9).alias("sample_key"),
                      F.col("sample_rank").cast("int")
                      .alias("sample_rank"))
