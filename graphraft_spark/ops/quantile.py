"""Exact distributed quantile gate — the 100 TB path the windowed
percent_rank gate documents.

``t_quality_gate`` (registry/textanalysis_queries.py) ranks every row
through one global window: exact, engine-portable, and single-shard —
the sort forces SinglePartition.  This module computes the SAME keep
set with no row-level global sort or window:

1. one aggregate builds the VALUE HISTOGRAM (count per distinct
   value) — the only global window runs over this histogram frame,
   whose size is bounded by the value domain, not the corpus (a
   6-dp-rounded score in [0, 1] has ≤ 1,000,001 distinct values no
   matter how many rows; at 100 TB the histogram is still ~MB);
2. the threshold row — the k-th smallest (value, tiebreak) — falls
   out of the cumulative histogram as a 1-row frame (k from the
   percent_rank inequality: keep pr ≥ τ ⇔ rank ≥ ceil(τ·(N−1)) + 1,
   computed in integer arithmetic for τ = p/q);
3. rows strictly above the threshold VALUE pass outright; the single
   boundary value group gets a per-GROUP window (partitioned by the
   value — never global) to apply the tiebreak.

Same output as the percent_rank form row-for-row (pinned by
tests/test_quantile_gate.py equivalence over random frames), one
corpus scan for the histogram + one for the gate, both shuffles keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def keep_top_fraction(df: DataFrame, value_col: str, tiebreak_col: str,
                      frac_num: int = 1, frac_den: int = 4) -> DataFrame:
    """Drop the bottom ``frac_num/frac_den`` of rows under the total
    order (value_col ASC, tiebreak_col ASC) — exactly the rows a
    ``percent_rank() ≥ frac`` gate keeps, without ranking the corpus.

    ``frac`` as an integer ratio keeps the rank threshold exact:
    keep ⇔ den·(rank−1) ≥ num·(N−1), so k = ceil(num·(N−1)/den) + 1 —
    pure integer arithmetic, no float-boundary drift.  A single-row
    frame (N = 1) has percent_rank 0 and is dropped for any frac > 0,
    matching the window form.

    Contract: ``value_col`` must be NON-NULL (a null neither groups
    nor compares — the range join drops it unconditionally, where the
    window form would rank nulls first) and BOUNDED-DOMAIN (the
    histogram is the value domain; round/bucketize continuous scores
    first, as t_quality_gate_scalable does with its 6-dp round);
    ``tiebreak_col`` must be UNIQUE WITHIN each value group so that
    (value, tiebreak) is a total order — duplicate tiebreaks at the
    boundary value make the row_number cut nondeterministic, where the
    percent_rank window form would assign EQUAL ranks and keep/drop
    the duplicates together (the registry uses satisfy this: doc_id /
    o_orderkey are primary keys)."""
    if not (0 < frac_num < frac_den):
        raise ValueError(f"need 0 < frac_num < frac_den; "
                         f"got {frac_num}/{frac_den}")
    v = F.col(value_col)
    # 1. value histogram — the only frame a global window ever touches;
    # N and the rank threshold k derive FROM it (no second corpus scan):
    # k (1-based) = ceil(num·(N−1)/den) + 1, pure integer arithmetic
    hist = df.groupBy(value_col).agg(F.count("*").alias("_cnt"))
    cum = hist.withColumn(
        "_cum", F.sum("_cnt").over(
            Window.orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0)))
    k = (F.floor((F.lit(frac_num) * (F.col("_n") - 1)
                  + F.lit(frac_den - 1)) / F.lit(frac_den))
         .cast("bigint") + 1)
    # threshold value group = first histogram row whose cum count
    # reaches k; carry cum_below = ranks consumed by smaller values
    thresh = (cum.withColumn("_n", F.max("_cum").over(
                  Window.orderBy(value_col)
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)))
              .filter(F.col("_n") > 1)
              .withColumn("_k", k)
              .filter(F.col("_cum") >= F.col("_k"))
              .groupBy()
              .agg(F.min(F.struct(value_col, "_cum", "_cnt", "_k"))
                   .alias("_t"))
              .select(F.col(f"_t.{value_col}").alias("_tv"),
                      (F.col("_t._cum") - F.col("_t._cnt")).alias("_below"),
                      F.col("_t._k").alias("_k")))
    # 2. ONE gate pass: the per-VALUE window is partitioned (only the
    # boundary group's ranks are consulted; other groups pay one local
    # row_number) — keep strictly-above rows plus the boundary suffix
    wg = Window.partitionBy(value_col).orderBy(tiebreak_col)
    return (df.join(F.broadcast(thresh), v >= F.col("_tv"))
            .withColumn("_rn", F.row_number().over(wg))
            .filter((v > F.col("_tv"))
                    | (F.col("_below") + F.col("_rn") >= F.col("_k")))
            .select(*df.columns))


def exact_global_rank(df: DataFrame, value_col: str, tiebreak_col: str,
                      out_col: str = "rank",
                      n_col: str | None = None) -> DataFrame:
    """Exact 1-based global rank under (value ASC, tiebreak ASC) with
    NO row-level global sort: the value histogram's cumulative
    count-below (global window over the bounded value domain only) is
    broadcast back onto the corpus, and a per-VALUE (partitioned)
    row_number supplies the tiebreak offset.  ``n_col``: also attach
    the total row count (derived from the same histogram — no second
    corpus scan).  Same non-null / bounded-domain / unique-tiebreak
    contract as :func:`keep_top_fraction` (the broadcast is the
    histogram; a duplicate tiebreak within a value group would make
    the assigned ranks nondeterministic across the duplicates)."""
    w_hist = Window.orderBy(value_col)
    hist = df.groupBy(value_col).agg(F.count("*").alias("_cnt"))
    cum = hist.select(
        value_col,
        F.coalesce(F.sum("_cnt").over(
            w_hist.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_below"),
        F.sum("_cnt").over(
            w_hist.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)).alias("_tot"))
    wg = Window.partitionBy(value_col).orderBy(tiebreak_col)
    out = (df.join(F.broadcast(cum), value_col)
           .withColumn(out_col,
                       F.col("_below") + F.row_number().over(wg)))
    if n_col is not None:
        out = out.withColumn(n_col, F.col("_tot"))
    return out.drop("_below", "_tot")


def exact_ntile(df: DataFrame, value_col: str, tiebreak_col: str,
                buckets: int, out_col: str = "bucket") -> DataFrame:
    """Exact NTILE(buckets) over (value ASC, tiebreak ASC) without the
    global sort NTILE forces: global rank via :func:`exact_global_rank`
    then NTILE's own split arithmetic — the first N mod buckets
    buckets take ceil(N/buckets) rows, the rest floor(N/buckets):
    bucket(r) = ceil(r/(q+1)) while r ≤ rem·(q+1), else
    rem + ceil((r − rem·(q+1))/q).  Bit-identical to the window NTILE
    under the same total order (ties broken by ``tiebreak_col``)."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive; got {buckets}")
    ranked = exact_global_rank(df, value_col, tiebreak_col,
                               out_col="_r", n_col="_n")
    q = F.floor(F.col("_n") / buckets).cast("bigint")
    rem = (F.col("_n") % buckets).cast("bigint")
    r = F.col("_r")
    head = rem * (q + 1)
    bucket = F.when(r <= head, F.ceil(r / (q + 1))).otherwise(
        rem + F.ceil((r - head) / q))
    return (ranked.withColumn(out_col, bucket.cast("int"))
            .drop("_r", "_n"))
