"""LLM-surface operators (SURVEY §2.F) as driver-contract queries.

Model seams run their deterministic implementations (hash-scorer trie
beam, echo generator) — pipelines stay checkable without a GPU; the
mapInPandas plumbing exercised here is byte-identical to what GPU
implementations ride on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.llm import (
    EchoGenerator,
    TrieConstrainedRanker,
    format_node_data,
    generate_answers_batch,
    llm1_prompt,
    rank_queries_batch,
)
from graphraft_spark.registry import register

# qa-shaped frame: question per customer, candidates = order-key queries
_QA_SQL = """
qa AS (
    SELECT CAST(o_custkey AS BIGINT) AS id,
           'which parts did customer ' || CAST(o_custkey AS VARCHAR)
               || ' order?' AS question,
           list('q-' || CAST(o_orderkey AS VARCHAR) ORDER BY o_orderkey)
               AS cypher_queries,
           list(o_orderkey % 5 ORDER BY o_orderkey) AS hits,
           list(o_orderkey % 11 + 1 ORDER BY o_orderkey) AS num_results
    FROM orders WHERE o_custkey < 40 GROUP BY o_custkey
)"""


def _qa(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") < 40)
    arr = lambda c: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.struct(F.col("o_orderkey").alias("k"),
                                             c.alias("v")))),
        lambda x: x["v"])
    return (
        o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
        .agg(
            F.first(F.concat(F.lit("which parts did customer "),
                             F.col("o_custkey").cast("string"),
                             F.lit(" order?"))).alias("question"),
            arr(F.concat(F.lit("q-"), F.col("o_orderkey").cast("string")))
            .alias("cypher_queries"),
            arr(F.col("o_orderkey") % 5).alias("hits"),
            arr(F.col("o_orderkey") % 11 + 1).alias("num_results"),
        )
    )


@register(
    "f_llm1_prompt",
    oracle=f"""
WITH {_QA_SQL.strip()}
SELECT id,
       '<start_of_turn>user' || chr(10) || question || '<end_of_turn>'
           || '<start_of_turn>assistant' || chr(10) AS prompt,
       '<start_of_turn>user' || chr(10) || question || '<end_of_turn>'
           || '<start_of_turn>assistant' || chr(10)
           || cypher_queries[1] || '<eos>' AS train_prompt
FROM qa
""")
def f_llm1_prompt(spark, sf_dir):
    """F5: LLM1 prompt formatting, inference + training variants
    (llm1.py:69-80) — pure concat expressions."""
    qa = _qa(spark, sf_dir)
    return qa.select(
        "id",
        llm1_prompt(F.col("question")).alias("prompt"),
        llm1_prompt(F.col("question"),
                    F.element_at("cypher_queries", 1)).alias("train_prompt"),
    )


@register(
    "f_node_formatter",
    oracle="""
WITH data AS (
    SELECT CAST(o_custkey AS BIGINT) AS id,
           list({'name': 'order-' || CAST(o_orderkey AS VARCHAR),
                 'detail': CASE WHEN o_orderkey % 3 = 0 THEN NULL
                           ELSE 'price ' || CAST(CAST(floor(o_totalprice)
                                                      AS BIGINT)
                                                 AS VARCHAR) END}
                ORDER BY o_orderkey) AS nodes
    FROM orders WHERE o_custkey < 40 GROUP BY o_custkey
)
SELECT id,
       array_to_string(list_transform(nodes,
           n -> CASE WHEN n.detail IS NULL THEN 'name: ' || n.name
                ELSE 'name: ' || n.name || chr(10) || 'detail: ' || n.detail
                END),
           chr(10) || chr(10)) AS info
FROM data
""")
def f_node_formatter(spark, sf_dir):
    """F6: node-data formatter — '{prop}: {value}' lines (nulls skipped),
    nodes joined by blank lines (llm2.py:67-71, retriever.py:39-40)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") < 40)
    nodes = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("o_orderkey").alias("k"),
            F.concat(F.lit("order-"), F.col("o_orderkey").cast("string"))
            .alias("name"),
            F.when(F.col("o_orderkey") % 3 != 0,
                   F.concat(F.lit("price "),
                            F.floor("o_totalprice").cast("bigint")
                            .cast("string"))).alias("detail")))),
        lambda x: F.struct(x["name"].alias("name"),
                           x["detail"].alias("detail")))
    data = (o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
            .agg(nodes.alias("nodes")))
    return data.select(
        "id", format_node_data(F.col("nodes"), ["name", "detail"])
        .alias("info"))


@register(
    "f_add_more_answers",
    oracle="""
WITH data AS (
    SELECT CAST(o_custkey AS BIGint) AS id,
           list('n' || CAST(o_orderkey % 7 AS VARCHAR) ORDER BY o_orderkey)
               AS names
    FROM orders WHERE o_custkey < 40 GROUP BY o_custkey
),
with_preds AS (SELECT id, names, names[1:2] AS predicted FROM data)
SELECT id,
       list_transform(
           list_filter(range(1, len(list_concat(predicted, names)) + 1),
               i -> list_position(list_concat(predicted, names),
                                  list_concat(predicted, names)[i]) = i),
           i -> list_concat(predicted, names)[i]) AS answers
FROM with_preds
""")
def f_add_more_answers(spark, sf_dir):
    """F7 add_more_answers (llm2.py:159-161): extend predictions with
    remaining retrieved names, preserving order, skipping duplicates —
    order-preserving distinct of predicted ++ names."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") < 40)
    names = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("o_orderkey").alias("k"),
            F.concat(F.lit("n"), (F.col("o_orderkey") % 7).cast("string"))
            .alias("v")))),
        lambda x: x["v"])
    data = (o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
            .agg(names.alias("names")))
    return data.select(
        "id",
        F.array_distinct(
            F.concat(F.slice("names", 1, 2), F.col("names"))).alias("answers"))


@register("f_rank_trie")  # rows-only: beam search is not SQL
def f_rank_trie(spark, sf_dir):
    """F4: trie-constrained beam ranking via mapInPandas with the
    deterministic hash scorer — output is always a verbatim subset of
    the candidates (the constraint invariant)."""
    qa = _qa(spark, sf_dir).select("id", "question", "cypher_queries")
    ranked = rank_queries_batch(qa, TrieConstrainedRanker(), k=5)
    return ranked.select("id", "top_cypher_queries")


@register(
    "f_generate_answers",
    oracle="""
WITH data AS (
    SELECT CAST(o_custkey AS BIGINT) AS id,
           'q?' AS question,
           list({'name': 'order-' || CAST(o_orderkey AS VARCHAR)}
                ORDER BY o_orderkey) AS nodes
    FROM orders WHERE o_custkey < 40 GROUP BY o_custkey
)
SELECT id, list_transform(nodes[1:3], n -> n.name) AS predicted_answers
FROM data
""")
def f_generate_answers(spark, sf_dir):
    """F7: batch answer generation through the mapInPandas seam with the
    deterministic echo generator (first-3 retrieved names) — the oracle
    pins the plumbing end-to-end."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") < 40)
    nodes = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.col("o_orderkey").alias("k"),
            F.concat(F.lit("order-"), F.col("o_orderkey").cast("string"))
            .alias("name")))),
        lambda x: F.struct(x["name"].alias("name")))
    data = (o.groupBy(F.col("o_custkey").cast("bigint").alias("id"))
            .agg(F.lit("q?").alias("question"), nodes.alias("data")))
    out = generate_answers_batch(data, EchoGenerator(n_answers=3))
    return out.select("id", "predicted_answers")


@register("p_full_pipeline")  # rows-only: multi-stage w/ driver-visible rank
def p_full_pipeline(spark, sf_dir):
    """End-to-end GraphRAFT.run() analog (graphraft.py:41-66) on the
    TPC-H graph: entity match → enumerate → trie-rank (deterministic
    scorer) → execute top-k patterns → budgeted retrieval.  Rows-only:
    the ranking stage is a beam search, not SQL."""
    from graphraft_spark.graph import tpch_graph
    from graphraft_spark.llm import TrieConstrainedRanker, EchoGenerator
    from graphraft_spark.pipeline import run_pipeline

    g = tpch_graph(spark, sf_dir)
    out = run_pipeline(
        spark, g,
        questions=[
            (1, "who supplies small ring?", ["small ring"]),
            (2, "what did customer 42 buy?", ["Customer#000000042"]),
        ],
        ranker=TrieConstrainedRanker(), generator=EchoGenerator(),
        max_nodes=15, k=3, patterns=("1hop", "2hop"))
    return out.select("qid", "nodeId", "name",
                      F.round("similarity", 6).alias("similarity"))
