"""Batch dataset operators (SURVEY §2.E) — the HF-`datasets` pipeline steps
(llm1.py / llm2.py / training notebooks) as native column expressions.

The reference's .map/.filter lambdas with num_proc=8 are embarrassingly
parallel row ops — exactly Spark's model; everything here stays in
whole-stage codegen (no Python in executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_parallel_arrays(queries: Column, hits: Column,
                         num_results: Column) -> Column:
    """E5 (llm1.py:53-58): sort three parallel arrays by composite key
    (hits DESC, num_results ASC), *stable* w.r.t. original positions —
    Python's sorted() is stable, so the original index is the final
    tie-break.  Returns ARRAY<STRUCT<query, hits, num_results>> in
    sorted order (callers project the fields they need).

    Implemented as index-array → struct zip → natural (lexicographic)
    array_sort on (-hits, num_results, idx): one codegen'd expression,
    no explode/shuffle.
    """
    idx = F.sequence(F.lit(1), F.size(queries))
    zipped = F.transform(
        idx,
        lambda i: F.struct(
            (-F.element_at(hits, i)).alias("k1"),
            F.element_at(num_results, i).alias("k2"),
            i.alias("k3"),
            F.element_at(queries, i).alias("q"),
        ),
    )
    return F.transform(
        F.array_sort(zipped),
        lambda x: F.struct(
            x["q"].alias("query"),
            (-x["k1"]).alias("hits"),
            x["k2"].alias("num_results"),
        ),
    )


def best_label_is_good(sorted_arr: Column, n_answers: Column,
                       min_precision: float = 0.1,
                       min_recall: float = 1.0) -> Column:
    """E6 (llm1.py:61-66): training-example quality gate on the best
    query after E5 ordering — precision = hits/num_results ≥ 0.1 AND
    recall = hits/|answers| ≥ 1.0."""
    best = F.element_at(sorted_arr, 1)
    hits = best["hits"].cast("double")
    return (
        (F.size(sorted_arr) > 0)
        & (best["num_results"] > 0) & (n_answers > 0)
        & (hits / best["num_results"] >= min_precision)
        & (hits / n_answers >= min_recall)
    )


def head_n(df: DataFrame, n: int, order_by: list[Column]) -> DataFrame:
    """E3: head-N on a *defined* order (the reference's
    .filter(lambda _, i: i < n, with_indices=True) relies on dataset
    order; distributed frames need an explicit one).

    sort+limit compiles to TakeOrderedAndProject — a distributed
    partial top-N with per-partition pruning, never the
    single-partition global window a row_number() formulation needs.
    Pass a TOTAL order (include a unique key) for deterministic results
    under ties, exactly as the window form required."""
    return df.orderBy(*order_by).limit(n)


def repair_queries(queries: Column) -> Column:
    """E8 (generate_training_data_llm2.ipynb cell 7): string repair pass
    over query arrays — RETURN x → RETURN DISTINCT x."""
    return F.transform(
        queries,
        lambda q: F.regexp_replace(q, r"RETURN x", "RETURN DISTINCT x"),
    )


def power_law_rank_sample(n_candidates: Column, key: Column,
                          n_samples: int = 5, alpha: float = 0.1) -> Column:
    """E7 (generate_training_data_llm2.ipynb cell 5): biased rank sampling
    for LLM2 training — inverse-CDF x**(1/alpha) pushes mass toward
    top-ranked queries.  Deterministic u_i from ``key`` (hash-free
    modular arithmetic so any engine reproduces it); duplicates dropped;
    returned ranks ascending (1-based).  Deviation from the reference:
    it *re*-samples until 5 distinct ranks — we take ≤ n_samples
    distinct draws; the ranking-bias property (the supervised signal)
    is preserved while staying a pure expression.
    """
    draws = F.sequence(F.lit(1), F.lit(n_samples))
    u = lambda i: ((key * 7919 + i * 104659) % 104729) / 104729.0  # noqa: E731
    rank = lambda i: F.least(  # noqa: E731
        n_candidates,
        F.floor(F.pow(u(i), 1.0 / alpha) * n_candidates).cast("int") + 1,
    )
    return F.array_sort(F.array_distinct(
        F.filter(F.transform(draws, rank), lambda r: r.isNotNull())
    ))


def _portable_hash60(col: Column, salt: str) -> Column:
    """Engine-portable deterministic hash (md5 prefix → bigint), the
    same arithmetic DuckDB expresses as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16, 10).cast("bigint")


def hash_split(df: DataFrame, key_col: str,
               weights: dict[str, int] | None = None,
               salt: str = "split") -> DataFrame:
    """Deterministic train/valid/test assignment by key hash — the
    dataset-split step of a training pipeline.  Stable across runs,
    partitionings, and engines (portable md5 arithmetic); rows sharing
    a key always land in the same split."""
    weights = weights or {"train": 8, "valid": 1, "test": 1}
    total = sum(weights.values())
    bucket = _portable_hash60(F.col(key_col), salt) % total
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def negative_samples(candidates: DataFrame, positives: DataFrame, k: int,
                     qid_col: str = "qid", id_col: str = "nodeId",
                     salt: str = "neg") -> DataFrame:
    """Per-question negative sampling for contrastive training data:
    the ``k`` candidate ids NOT in the positive set with the smallest
    per-(qid,id) portable hash — uniform without replacement,
    reproducible, and expressible in an external SQL oracle.  One
    anti-join + one per-qid window."""
    from pyspark.sql import Window

    anti = candidates.join(positives.select(qid_col, id_col),
                           [qid_col, id_col], "left_anti")
    h = _portable_hash60(
        F.concat_ws("#", F.col(qid_col), F.col(id_col)), salt)
    w = Window.partitionBy(qid_col).orderBy(h.asc(), F.col(id_col))
    return (anti.withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= k))


def deterministic_shuffle(df: DataFrame, key_col: str,
                          seed: str = "epoch0",
                          out_col: str = "shuffle_rank") -> DataFrame:
    """Training-order randomization: a total, seed-keyed, engine-portable
    ordering — ``rank = row_number() over (order by H(seed, key), key)``.
    Changing ``seed`` (e.g. per epoch) produces an independent order;
    the same seed reproduces it bit-for-bit on any engine (portable md5
    arithmetic, same contract as hash_split).

    The global window is ONE total-order sort — exactly the shuffle a
    training-data writer pays anyway to emit a shuffled dataset, and at
    100 TB the standard physical form is range-partitioning on the hash
    (sort-within-partitions after repartitionByRange) rather than a
    single-partition window; the rank semantics are identical, so the
    oracle covers both."""
    from pyspark.sql import Window

    h = _portable_hash60(F.col(key_col), seed)
    w = Window.orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn(out_col, F.row_number().over(w))


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    key_col: str = "doc_id",
                    salt: str = "ws0") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006): per row draw u ~ Uniform(0,1) from the portable
    key hash and keep the n largest ``ln(u) / w`` — an exact
    exponential-keys sample, reproducible bit-for-bit across runs,
    partitionings, and engines (no RNG state; reshuffle = new salt).

    This is the selection step DSIR's stochastic variant needs on top
    of ``dsir_weights`` (pass ``exp(weight)`` for log-ratio weights —
    weights must be strictly positive).  Plan shape: one codegen
    projection + TakeOrdered; no shuffle beyond the top-n merge.
    """
    h = _portable_hash60(F.col(key_col), salt) % F.lit(2**59)
    u = (h.cast("double") + 0.5) / F.lit(float(2**59))
    w = F.col(weight_col).cast("double")
    return (df.filter(w > 0)
            .withColumn("sample_key", F.log(u) / w)
            .orderBy(F.desc("sample_key"), F.asc(key_col))
            .limit(n))


def weighted_sample_per_group(df: DataFrame, weight_col: str, n: int,
                              group_col: str = "source",
                              key_col: str = "doc_id",
                              salt: str = "ws0") -> DataFrame:
    """Stratified :func:`weighted_sample`: an independent exponential-
    keys draw of ``n`` rows per group (per source / language / shard) —
    the shape curation quotas actually run at scale.  Window top-n per
    group (hash-partition by group, per-partition heap — no global
    sort); same portable-hash determinism."""
    from pyspark.sql import Window

    h = _portable_hash60(F.col(key_col), salt) % F.lit(2**59)
    u = (h.cast("double") + 0.5) / F.lit(float(2**59))
    w = F.col(weight_col).cast("double")
    win = Window.partitionBy(group_col).orderBy(
        F.desc("sample_key"), F.asc(key_col))
    return (df.filter(w > 0)
            .withColumn("sample_key", F.log(u) / w)
            .withColumn("sample_rank", F.row_number().over(win))
            .filter(F.col("sample_rank") <= n))


def scd2_compact(history: DataFrame, key_col: str, ts_col: str,
                 attr_cols: tuple[str, ...],
                 tiebreak_col: str | None = None) -> DataFrame:
    """Build a slowly-changing-dimension (SCD type 2) table from a
    change log: per key, keep only rows where the tracked attributes
    actually changed, stamp ``valid_from`` = the change's timestamp and
    ``valid_to`` = the NEXT change's (NULL while current), plus an
    ``is_current`` flag — the merge-free way to version dimensions on
    a plain columnar store (no Delta/iceberg required).

    One shuffle on the key; two window passes over each key's ordered
    history (lag to detect change points, lead to close intervals).
    ``tiebreak_col`` breaks equal timestamps deterministically."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = None
    for c in attr_cols:
        neq = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = neq if changed is None else (changed | neq)
    changed = changed | F.lag(ts_col).over(w).isNull()
    points = history.withColumn("_chg", changed).filter("_chg")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (points
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop("_chg"))
