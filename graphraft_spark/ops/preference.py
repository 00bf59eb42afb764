"""Preference-data construction — the RLHF/RFT data-prep step between
generation and training: given N scored candidate answers per prompt,
select the winners (rejection sampling / best-of-n) or build
(chosen, rejected) preference pairs (DPO/RLHF reward-model format).

Both are ONE window per prompt group — partition size = candidates per
prompt (a generation-time constant, typically 4–64), so there is no
skew axis beyond the prompt key itself and everything stays in
whole-stage codegen.  Deterministic tie order (reward DESC, candidate
ASC) keeps the output engine-portable and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_of_n(df: DataFrame, prompt_col: str = "prompt_id",
              cand_col: str = "candidate",
              reward_col: str = "reward", k: int = 1,
              min_reward: float | None = None) -> DataFrame:
    """Rejection sampling: keep the top-``k`` candidates per prompt by
    reward (ties → smaller candidate value), optionally dropping
    everything under ``min_reward`` FIRST — a prompt whose best
    candidate still fails the floor yields no rows, which is the
    correct rejection-sampling behavior (don't train on the least-bad
    failure).  Adds ``rank`` (1-based)."""
    if min_reward is not None:
        df = df.filter(F.col(reward_col) >= min_reward)
    w = (Window.partitionBy(prompt_col)
         .orderBy(F.desc(reward_col), F.asc(cand_col)))
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def dpo_pairs(df: DataFrame, prompt_col: str = "prompt_id",
              cand_col: str = "candidate",
              reward_col: str = "reward",
              min_margin: float = 0.0) -> DataFrame:
    """Preference pairs: per prompt, chosen = highest-reward candidate,
    rejected = lowest (deterministic ties as in :func:`best_of_n`);
    prompts whose best-worst reward gap is below ``min_margin`` are
    dropped — a near-tie pair teaches the preference model noise.

    Returns (prompt, chosen, rejected, reward_chosen, reward_rejected,
    margin).  One window pass computing both extremes, then a filter —
    no self-join of the candidate set."""
    w_desc = (Window.partitionBy(prompt_col)
              .orderBy(F.desc(reward_col), F.asc(cand_col)))
    # ordered + explicit full frame (same result as an unordered
    # partition count; the ordered form also prints an unambiguous
    # partitioned Window node for the plan linter)
    w_all = (Window.partitionBy(prompt_col)
             .orderBy(F.desc(reward_col), F.asc(cand_col))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    ranked = df.select(
        F.col(prompt_col), F.col(cand_col), F.col(reward_col),
        F.row_number().over(w_desc).alias("_rk"),
        F.count("*").over(w_all).alias("_n"))
    top = ranked.filter(F.col("_rk") == 1).select(
        prompt_col, F.col(cand_col).alias("chosen"),
        F.col(reward_col).alias("reward_chosen"))
    bot = ranked.filter((F.col("_rk") == F.col("_n")) & (F.col("_n") > 1)) \
        .select(prompt_col, F.col(cand_col).alias("rejected"),
                F.col(reward_col).alias("reward_rejected"))
    out = top.join(bot, prompt_col)
    margin = F.col("reward_chosen") - F.col("reward_rejected")
    return (out.withColumn("margin", margin)
            .filter(F.col("margin") >= min_margin))
