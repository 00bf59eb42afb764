"""SFT training-table export (SURVEY §2.F8, engine-side half).

Fine-tuning itself stays an external step (LoRA/TRL in the reference,
llm1.py:90-115 / llm2.py:80-122), but the reference's trainers consume
engine-produced tables of exact prompt/completion strings.  These
builders emit those tables as pure column expressions — the quality
gate, the parallel-array best-query sort, and the byte-exact prompt
formats — so the training loop can read the parquet output directly
(the 100 TB path: one gated projection, no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphraft_spark.data import best_label_is_good, sort_parallel_arrays
from graphraft_spark.llm.prompts import (
    ANSWER_SEPARATOR,
    END_OF_GENERATION,
    INSTRUCTION_TEMPLATE,
    RESPONSE_TEMPLATE,
    format_node_data,
    llm1_prompt,
    llm2_instruction,
)


def llm1_sft_table(qa: DataFrame, n_answers: Column,
                   question_col: str = "question",
                   queries_col: str = "cypher_queries",
                   hits_col: str = "hits",
                   num_results_col: str = "num_results") -> DataFrame:
    """LLM1 SFT rows (llm1.py:90-115): for every question passing the
    label-quality gate (precision ≥ 0.1, recall ≥ 1.0 on the best-sorted
    candidate, llm1.py:61-66), emit

    * ``prompt``      — the inference-form chat prompt (F5),
    * ``completion``  — the gold best query + EOS,
    * ``text``        — prompt‖completion, the exact training string.
    """
    s = sort_parallel_arrays(F.col(queries_col), F.col(hits_col),
                             F.col(num_results_col))
    qa = qa.withColumn("_s", s).filter(
        best_label_is_good(F.col("_s"), n_answers))
    best = F.element_at("_s", 1)["query"]
    return qa.select(
        *[c for c in qa.columns if c not in
          (queries_col, hits_col, num_results_col, "_s", question_col)],
        F.col(question_col).alias("question"),
        llm1_prompt(F.col(question_col)).alias("prompt"),
        F.concat(best, F.lit(END_OF_GENERATION)).alias("completion"),
        llm1_prompt(F.col(question_col), best).alias("text"),
    )


def llm2_sft_table(qa: DataFrame, props: list[str],
                   question_col: str = "question",
                   data_col: str = "data",
                   answers_col: str = "answers") -> DataFrame:
    """LLM2 SFT rows (llm2.py:80-122): prompt = instruction template +
    question + formatted retrieved-node info + response template (F6);
    completion = gold answer names joined by the answer separator + EOS.
    The completion-only collator boundary is exactly the prompt/
    completion split emitted here."""
    info = format_node_data(F.col(data_col), props)
    prompt = F.concat(
        F.lit(INSTRUCTION_TEMPLATE),
        llm2_instruction(F.col(question_col), info),
        F.lit(RESPONSE_TEMPLATE),
    )
    completion = F.concat(
        F.concat_ws(ANSWER_SEPARATOR, F.col(answers_col)),
        F.lit(END_OF_GENERATION))
    return qa.select(
        *[c for c in qa.columns if c not in (data_col, answers_col,
                                             question_col)],
        F.col(question_col).alias("question"),
        prompt.alias("prompt"),
        completion.alias("completion"),
        F.concat(prompt, completion).alias("text"),
    )


def write_sft(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize an SFT table for the external trainer."""
    df.write.mode(mode).parquet(path)
