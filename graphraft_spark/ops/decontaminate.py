"""Benchmark decontamination: flag/drop training documents that share
word n-grams with an evaluation corpus (the standard 13-gram rule from
LLM training-data hygiene; every frontier pipeline runs a pass like
this before training — the reference has no equivalent, §2.H extension).

Spark-first shape: the benchmark side is SMALL relative to the corpus
(eval sets are thousands of docs vs billions), so its distinct n-gram
set broadcasts and the corpus side is one scan + explode + broadcast
semi-join — no shuffle of the 100 TB side at all.  The n-gram explode
multiplies corpus rows by ~doc length, but it feeds straight into a
broadcast hash join inside the same whole-stage-codegen pipeline (no
materialization); the follow-up distinct-on-hits aggregates only the
matching doc ids.

Two paths, same split as the dedup family:
* portable (string n-grams) — DuckDB-reproducible, the oracle anchor;
* hashed (xxhash64 rolling n-gram hashes via ``hashed_shingles``) —
  no n-gram strings ever built, the production path at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphraft_spark.ops.dedup import hashed_shingles, shingles


def _gram_col(text: Column, n: int, hashed: bool) -> Column:
    return hashed_shingles(text, n) if hashed else shingles(text, n)


# Measured crossover (BASELINE.md round-8 ×50 soak): direct broadcast
# of hashed grams stays ~linear and beats the bloom prefilter until the
# benchmark gram set is too large to broadcast at all — ≳1e8 grams
# (~800 MB of xxhash64 values).  Below that, bloom's k=4 probe hashes
# per corpus gram are pure overhead.
AUTO_BLOOM_MIN_GRAMS = 100_000_000


def choose_decontamination(benchmark: DataFrame, n: int = 13,
                           text_col: str = "text",
                           bench_text_col: str | None = None,
                           hashed: bool = False,
                           min_grams_for_bloom: int = AUTO_BLOOM_MIN_GRAMS,
                           ) -> tuple[str, int]:
    """Derive the decontamination path from the benchmark's OWN size —
    the same shape as dedup's ``adaptive_bucket_cap``: one cheap
    ``approx_count_distinct`` over the benchmark grams (the small side;
    the corpus is never touched), then the measured crossover rule.

    Returns ``("direct", 0)`` when the gram set broadcasts comfortably,
    else ``("bloom", num_bits)`` with ``num_bits`` sized by the
    documented 10×-bits rule (next power of two ≥ 10 × grams — the
    ~1% fp point; a saturated filter prefilters nothing and the
    exact-verify join inherits the full load)."""
    gcol = bench_text_col or text_col
    est = (benchmark
           .select(F.explode(_gram_col(F.col(gcol), n, hashed))
                   .alias("g"))
           .agg(F.approx_count_distinct("g").alias("c"))
           .collect()[0].c)
    if est >= min_grams_for_bloom:
        num_bits = 1 << max(16, int(10 * est - 1).bit_length())
        return "bloom", num_bits
    return "direct", 0


def contamination_flags(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str | None = None,
                        hashed: bool = False) -> DataFrame:
    """Per-document contamination report: (id_col, n_hits, contaminated).

    ``n_hits`` = how many DISTINCT n-grams of the doc appear anywhere in
    the benchmark corpus; ``contaminated`` = n_hits > 0.  Docs shorter
    than ``n`` words contribute their whole-text gram (matching the
    shingle semantics), so an exact copy of a short benchmark doc still
    flags."""
    from graphraft_spark.data.partitioning import fanout_repartition

    bench_grams = (
        benchmark
        .select(F.explode(_gram_col(
            F.col(bench_text_col or text_col), n, hashed)).alias("g"))
        .distinct()
    )
    # the gram build is per-row-expensive (k-1 interpreted zip_with
    # passes); a single-row-group corpus file must not pin it to one
    # core — no-op on a properly partitioned big scan
    doc_grams = fanout_repartition(docs).select(
        F.col(id_col),
        F.explode(_gram_col(F.col(text_col), n, hashed)).alias("g"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None,
                  hashed: bool = True) -> DataFrame:
    """Drop contaminated docs (anti-join against the flagged ids);
    production default uses the hashed gram path."""
    dirty = (
        contamination_flags(docs, benchmark, n, text_col, id_col,
                            bench_text_col, hashed)
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    # no broadcast hint: the dirty set is bounded by CORPUS
    # contamination, not the small benchmark side — a leaked boilerplate
    # template can flag a large corpus fraction, and the planner should
    # be free to shuffle the anti-join in that case
    return docs.join(dirty, id_col, "left_anti")


def bloom_decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str | None = None,
                        hashed: bool = False, num_bits: int = 65_536,
                        k: int = 4, hash_fn: str = "xx") -> DataFrame:
    """:func:`contamination_flags` with a Bloom PREFILTER — same exact
    output (same oracle), different 100 TB constant factor.

    The broadcast in ``contamination_flags`` ships the benchmark's raw
    distinct gram strings to every executor; at a few million grams
    that broadcast is hundreds of MB.  Here executors receive a FIXED
    ``num_bits/64``-word bitmap instead: corpus grams stream through
    the bloom probe (no false negatives), and only the tiny
    ``maybe_present`` survivor stream pays the exact semi-join against
    the real gram set — false positives die there, so the result is
    exactly ``contamination_flags``'s.
    """
    from graphraft_spark.data.partitioning import fanout_repartition
    from graphraft_spark.ops.sketches import bloom_build, bloom_probe

    gcol = bench_text_col or text_col
    bench_grams = (benchmark
                   .select(F.explode(_gram_col(F.col(gcol), n, hashed))
                           .alias("g"))
                   .distinct())
    bloom = bloom_build(bench_grams, "g", num_bits, k, hash_fn)
    doc_grams = fanout_repartition(docs).select(
        F.col(id_col),
        F.explode(_gram_col(F.col(text_col), n, hashed)).alias("g"))
    maybe = (bloom_probe(bloom, doc_grams.select("g").distinct(), "g",
                         num_bits, k, hash_fn)
             .filter(F.col("maybe_present"))
             .select(F.col("item").alias("g")))
    # exact verify: survivors (tiny after the bloom) against the real
    # gram set; false positives are eliminated here
    survivors = maybe.join(bench_grams, "g", "left_semi")
    hits = (doc_grams.join(F.broadcast(survivors), "g")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hits")))
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))
