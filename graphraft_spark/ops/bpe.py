"""Distributed BPE tokenizer training and encoding.

Training a byte-pair-encoding vocabulary is the canonical pre-training
data job Spark is shaped for: the classic algorithm (Sennrich et al.
2016) iterates over a WORD-FREQUENCY table, not the corpus — so the
distributed plan collapses 100 TB of text into one distinct-word frame
(vocabulary-sized, millions of rows not billions) in a single shuffle,
and every merge iteration after that touches only that small frame:

1. pre-tokenize: whitespace words + ``</w>`` end-of-word marker,
   one groupBy(word).sum() shuffle over the corpus — the ONLY
   corpus-sized step;
2. per merge round: adjacent symbol pairs weighted by word frequency
   (zip_with over the symbol array — no explode of positions), one
   aggregate, collect the single best pair (count desc, pair asc —
   deterministic tie-break), then rewrite the symbol arrays with a
   left-fold that reproduces greedy left-to-right merging exactly
   ("aaa" + merge (a,a) → [aa, a], never [a, aa] or [aa, aa]);
3. the word frame is localCheckpoint'ed per round (same lineage guard
   as graph/algos.py:pagerank — it is referenced by both the pair
   count and the rewrite).

Encoding applies the learned merge ranks with an Arrow-batched pandas
UDF (the per-word merge loop is inherently sequential and
rank-table-driven — exactly the "genuinely can't express with built-in
operators" case SURVEY §3 reserves Python seams for).  The merge table
rides the closure as a broadcast-sized dict.

Parity: tests/test_bpe.py pins the trainer against an independent
pure-Python reference implementation — identical merge sequence and
identical encodings on multi-merge corpora with overlap edge cases.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — lowercased whitespace words with
    the end-of-word marker appended.  The one corpus-sized shuffle."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .withColumn("word", F.concat("word", F.lit(EOW)))
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Split a marker-suffixed word into single characters + EOW as its
    own trailing symbol."""
    body = F.expr(f"substring(word, 1, length(word) - {len(EOW)})")
    return F.concat(F.split(body, ""), F.array(F.lit(EOW)))


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """array<struct<a,b>> of adjacent symbol pairs (zip_with against the
    shifted array; the null-padded tail pair is filtered)."""
    shifted = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    pairs = F.zip_with(syms, shifted,
                       lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return F.filter(pairs, lambda p: p["b"].isNotNull())


def _merge_fold(syms: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b via a
    left fold — the fold's "did I just consume this symbol" state is
    implicit in the accumulator's last element, which matches the
    sequential reference algorithm exactly."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 50) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list.  Stops early when no pair occurs twice."""
    wf = (word_frequencies(df, text_col)
          .select("freq", _initial_symbols(F.col("word")).alias("syms"))
          .localCheckpoint(eager=True))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            wf.select("freq", F.explode(_adjacent_pairs(F.col("syms")))
                      .alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .first())
        if best is None or best["cnt"] < 2:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        wf = (wf.select("freq", _merge_fold(F.col("syms"), a, b)
                        .alias("syms"))
              .localCheckpoint(eager=True))
    return merges


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (rank order =
    merge priority, standard BPE encode).  Arrow-batched mapInPandas-
    style pandas UDF; the rank dict broadcasts with the closure."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            cands = [(ranks[(syms[i], syms[i + 1])], i)
                     for i in range(len(syms) - 1)
                     if (syms[i], syms[i + 1]) in ranks]
            if not cands:
                break
            rank, _ = min(cands)
            a, b = merges[rank]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def tokenize(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            toks = []
            for w in (text or "").lower().split():
                if w not in cache:
                    cache[w] = encode_word(w)
                toks.extend(cache[w])
            return toks

        return texts.map(enc)

    return df.withColumn(out_col, tokenize(F.col(text_col)))
