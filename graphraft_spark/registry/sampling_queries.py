"""Deterministic sampling / dataset-split queries (ops/sampling.py).

All three are value-checked end-to-end: the DuckDB oracle recomputes the
portable md5 bucket bit-for-bit, so a pass proves the actual ASSIGNMENT
(which row landed in which split / sample / pick), not just counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphraft_spark.ops.sampling import (
    RESOLUTION,
    group_pick,
    hash_split,
    stratified_sample,
)
from graphraft_spark.registry import register

# DuckDB twin of ops/sampling.py:_key_hash.
_BUCKET = ("(('0x' || substr(md5('{seed}:' || CAST({key} AS VARCHAR)), "
           "1, 15))::BIGINT % {res})")


@register(
    "e_hash_split", extra=True,
    oracle=f"""
SELECT split, source, COUNT(*) AS n, MIN(doc_id) AS min_doc
FROM (
    SELECT source, doc_id,
           CASE WHEN {_BUCKET.format(seed='split', key='doc_id',
                                     res=RESOLUTION)} < 900000 THEN 'train'
                WHEN {_BUCKET.format(seed='split', key='doc_id',
                                     res=RESOLUTION)} < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
)
GROUP BY split, source
""")
def e_hash_split(spark, sf_dir):
    """90/5/5 train/val/test split of the documents corpus keyed by
    doc_id — one scan, no shuffle before the (tiny) count agg; the
    oracle recomputes every row's bucket, so boundary placement is
    value-checked, not count-checked."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        hash_split(docs, "doc_id",
                   {"train": 0.90, "val": 0.05, "test": 0.05})
        .groupBy("split", "source")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("min_doc"))
    )


@register(
    "e_stratified_sample", extra=True,
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_BUCKET.format(seed='sample', key='doc_id', res=RESOLUTION)}
      < CASE lang WHEN 'en' THEN 500000
                  WHEN 'de' THEN 250000
                  ELSE 100000 END
""")
def e_stratified_sample(spark, sf_dir):
    """Language-stratified downsample (en 50%, de 25%, rest 10%) — the
    corpus-rebalancing primitive.  Pure scan+filter plan; returns the
    sampled rows themselves so the oracle checks membership exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        stratified_sample(docs, "lang",
                          {"en": 0.50, "de": 0.25},
                          key_col="doc_id", default_fraction=0.10)
        .select("doc_id", "lang", "source")
    )


@register(
    "e_group_pick", extra=True,
    oracle=f"""
SELECT source, doc_id, pick_rank
FROM (
    SELECT source, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_BUCKET.format(seed='pick', key='doc_id',
                                        res=RESOLUTION)}, doc_id
           ) AS pick_rank
    FROM documents
)
WHERE pick_rank <= 3
""")
def e_group_pick(spark, sf_dir):
    """Deterministic 3-per-source uniform pick (hash-ordered reservoir):
    the eval-set / inspection-sample primitive.  One window partitioned
    by source — per-group state stays in its partition."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        group_pick(docs, "source", 3, key_col="doc_id")
        .select("source", "doc_id", "pick_rank")
    )
