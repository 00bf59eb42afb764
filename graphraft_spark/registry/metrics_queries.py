"""IR metrics (SURVEY §2.G) as oracle-checked queries.

QA-shaped rows derived deterministically from lineitem: per order,
``preds`` = partkeys in linenumber order (duplicates possible — set
semantics exercised), ``labels`` = partkeys of lines with quantity ≥ 25.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.metrics import compute_metrics, metric_col
from graphraft_spark.registry import register
from graphraft_spark.registry.retrieval_queries import (
    _ACCUM_SQL as _R_ACCUM_SQL,
    _RESULTS_SQL as _R_RESULTS_SQL,
)
from graphraft_spark.sources.pq_cache import load_pq

METRICS = ["precision", "recall", "f1", "hit@1", "hit@5", "recall@20",
           "mrr", "num_nodes"]

_QA_SQL = """
qa AS (
    SELECT l_orderkey AS id,
           list(l_partkey ORDER BY l_linenumber, l_partkey) AS preds,
           coalesce(list(l_partkey ORDER BY l_linenumber, l_partkey)
                        FILTER (WHERE l_quantity >= 25), []) AS labels
    FROM lineitem GROUP BY l_orderkey
)"""


def _qa(spark, sf_dir):
    # ONE collect_list buffer (with the quantity flag carried as a
    # third struct field) instead of two — labels derive by filter
    # after the single sort.  (l_orderkey, l_linenumber) is unique, so
    # the extra field never reorders the sort; output is identical
    # (exceptAll both ways: 0) and the aggregation does half the
    # buffer/sort work (guide §1.2 — measured 0.75× on this line).
    li = load_pq(spark, f"{sf_dir}/lineitem.parquet")
    arr = F.array_sort(F.collect_list(F.struct(
        "l_linenumber", "l_partkey",
        (F.col("l_quantity") >= 25).alias("hi"))))
    return (
        li.groupBy(F.col("l_orderkey").alias("id"))
        .agg(
            F.transform(arr, lambda x: x["l_partkey"]).alias("preds"),
            F.transform(F.filter(arr, lambda x: x["hi"]),
                        lambda x: x["l_partkey"]).alias("labels"),
        )
    )


_MRR_SQL = """coalesce(1.0 / list_min(list_filter(
        list_transform(labels, l -> list_position(preds, l)),
        p -> p > 0)), 0.0)"""

_HITS = "len(list_intersect({p}, labels))"


def _prec_sql(p="preds"):
    return (f"CASE WHEN len({p}) > 0 THEN "
            f"CAST({_HITS.format(p=p)} AS DOUBLE) / len({p}) ELSE 0.0 END")


def _rec_sql(p="preds"):
    return (f"CASE WHEN len(labels) > 0 THEN "
            f"CAST({_HITS.format(p=p)} AS DOUBLE) / len(labels) ELSE 0.0 END")


@register(
    "m_metrics_per_row",
    oracle=f"""
WITH {_QA_SQL.strip()}
SELECT id,
       ROUND({_prec_sql()}, 6) AS precision,
       ROUND({_rec_sql()}, 6) AS recall,
       ROUND(CASE WHEN {_prec_sql()} <> 0
             THEN 2 * ({_prec_sql()}) * ({_rec_sql()})
                  / (({_prec_sql()}) + ({_rec_sql()})) ELSE 0.0 END, 6) AS f1,
       CAST({_HITS.format(p='preds[1:1]')} > 0 AS INT) AS hit_at_1,
       CAST({_HITS.format(p='preds[1:5]')} > 0 AS INT) AS hit_at_5,
       ROUND({_MRR_SQL}, 6) AS mrr,
       CAST(len(preds) AS BIGINT) AS num_nodes
FROM qa
""")
def m_metrics_per_row(spark, sf_dir):
    """G1-G7 per example: precision/recall/f1/hit@k/mrr/num_nodes as
    one whole-stage-codegen projection (compute_metrics.py:31-56)."""
    qa = _qa(spark, sf_dir)
    p, l = F.col("preds"), F.col("labels")
    return qa.select(
        "id",
        F.round(metric_col("precision", p, l), 6).alias("precision"),
        F.round(metric_col("recall", p, l), 6).alias("recall"),
        F.round(metric_col("f1", p, l), 6).alias("f1"),
        metric_col("hit@1", p, l).alias("hit_at_1"),
        metric_col("hit@5", p, l).alias("hit_at_5"),
        F.round(metric_col("mrr", p, l), 6).alias("mrr"),
        metric_col("num_nodes", p, l).alias("num_nodes"),
    )


@register(
    "m_metrics_macro", extra=True,
    oracle=f"""
WITH {_QA_SQL.strip()}
SELECT ROUND(AVG({_prec_sql()}), 6) AS precision,
       ROUND(AVG({_rec_sql()}), 6) AS recall,
       ROUND(AVG(CAST({_HITS.format(p='preds[1:1]')} > 0 AS INT)), 6)
           AS "hit@1",
       ROUND(AVG(CAST({_HITS.format(p='preds[1:5]')} > 0 AS INT)), 6)
           AS "hit@5",
       ROUND(AVG({_rec_sql(p='preds[1:20]')}), 6) AS "recall@20",
       ROUND(AVG({_MRR_SQL}), 6) AS mrr,
       ROUND(AVG(CAST(len(preds) AS BIGINT)), 6) AS num_nodes
FROM qa
""")
def m_metrics_macro(spark, sf_dir):
    """G8: macro-averaged metric set — the reference's benchmark surface
    (compute_metrics.py:62-64, llm2.py:228,231) as one aggregation."""
    out = compute_metrics(_qa(spark, sf_dir),
                          ["precision", "recall", "hit@1", "hit@5",
                           "recall@20", "mrr", "num_nodes"])
    return out.select(*[F.round(F.col(f"`{c}`"), 6).alias(c)
                        for c in out.columns])


@register(
    "m_retrieval_eval", extra=True,  # re-promoted r11; demoted r13 (eighth wave)
    oracle=f"""
WITH {_R_RESULTS_SQL.strip()},
{_R_ACCUM_SQL.strip()},
qa AS (
    SELECT k.qid,
           list(k.nodeId ORDER BY k.queryIdx, k.rank) AS preds,
           coalesce((SELECT list(CAST(c_custkey AS BIGINT) + 1000000000
                                 ORDER BY c_custkey)
                     FROM customer
                     WHERE c_custkey % 13 = k.qid
                           AND (c_nationkey = k.qid
                                OR c_nationkey = k.qid + 5)), [])
               AS labels
    FROM kept k GROUP BY k.qid
)
SELECT qid,
       ROUND({_prec_sql()}, 6) AS precision,
       ROUND({_rec_sql()}, 6) AS recall,
       CAST({_HITS.format(p='preds[1:5]')} > 0 AS INT) AS hit_at_5,
       ROUND({_MRR_SQL}, 6) AS mrr,
       CAST(len(preds) AS BIGINT) AS num_nodes
FROM qa
""")
def m_retrieval_eval(spark, sf_dir):
    """Retrieval-only evaluation — the reference's pre-LLM2 benchmark
    surface (generate_training_data_llm2.ipynb cell 9): budgeted
    retrieval output scored against gold answer ids with the full metric
    set, one composed plan (retrieve → metrics)."""
    from graphraft_spark.registry.retrieval_queries import (
        MAX_NODES, _results)
    from graphraft_spark.retrieve import budgeted_accumulate

    kept = budgeted_accumulate(_results(spark, sf_dir), MAX_NODES)
    preds = (
        kept.groupBy("qid")
        .agg(F.transform(
            F.array_sort(F.collect_list(
                F.struct("queryIdx", "rank", "nodeId"))),
            lambda x: x["nodeId"]).alias("preds"))
    )
    cust = load_pq(spark, f"{sf_dir}/customer.parquet")
    qids = spark.createDataFrame([(i,) for i in range(5)], "qid bigint")
    labels = (
        cust.crossJoin(F.broadcast(qids))
        .filter((F.col("c_custkey") % 13 == F.col("qid"))
                & ((F.col("c_nationkey") == F.col("qid"))
                   | (F.col("c_nationkey") == F.col("qid") + 5)))
        .groupBy("qid")
        .agg(F.sort_array(F.collect_list(
            F.col("c_custkey").cast("bigint") + 1_000_000_000))
            .alias("labels"))
    )
    qa = (preds.join(labels, "qid", "left")
          .withColumn("labels", F.coalesce("labels", F.array())))
    p, l = F.col("preds"), F.col("labels")
    return qa.select(
        "qid",
        F.round(metric_col("precision", p, l), 6).alias("precision"),
        F.round(metric_col("recall", p, l), 6).alias("recall"),
        metric_col("hit@5", p, l).alias("hit_at_5"),
        F.round(metric_col("mrr", p, l), 6).alias("mrr"),
        metric_col("num_nodes", p, l).alias("num_nodes"),
    )
