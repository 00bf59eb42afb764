"""Batch model execution over DataFrames — the ONLY places Python crosses
into executors in the LLM surface (SURVEY §2.H): Arrow-batched
mapInPandas, ranker/generator shipped as broadcast-closure callables.

The reference runs the same ops as HF .map(num_proc=8) process pools
(generate_training_data_llm1.ipynb cells 3-4, llm2.py:211-214); Spark
gives the identical row-parallel semantics with cluster scale-out.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from graphraft_spark.llm.protocols import AnswerGenerator, QueryRanker


def rank_queries_batch(df: DataFrame, ranker: QueryRanker, k: int = 5,
                       question_col: str = "question",
                       candidates_col: str = "cypher_queries",
                       out_col: str = "top_cypher_queries") -> DataFrame:
    """llm1.py:118-125 generate_valid/test: top_cypher_queries per row."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<string>"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf[out_col] = [
                ranker.rank(q, list(c), k)
                for q, c in zip(pdf[question_col], pdf[candidates_col])
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def generate_answers_batch(df: DataFrame, generator: AnswerGenerator,
                           add_more_answers: bool = False,
                           question_col: str = "question",
                           data_col: str = "data",
                           out_col: str = "predicted_answers") -> DataFrame:
    """llm2.py:211-216 evaluate loop: predicted_answers per row.  ``data``
    is the native ARRAY<STRUCT> retrieved-node column (never the
    reference's stringified eval() round-trip, SURVEY §1.2 E10)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} array<string>"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf[out_col] = [
                generator.generate(
                    q,
                    [d if isinstance(d, dict) else d.asDict()
                     for d in ([] if data is None else list(data))],
                    add_more_answers,
                )
                for q, data in zip(pdf[question_col], pdf[data_col])
            ]
            yield pdf

    return df.mapInPandas(run, schema=schema)
