"""Perplexity-based corpus filtering (the CCNet recipe): score every
document's per-character perplexity under a reference LM trained on
trusted text, then keep the low-perplexity band.

The reference LM here is the engine's own CharNgramLM (llm/ngram_lm.py
— the same model that drives the trie ranker seam); production swaps a
KenLM behind the identical ``bytes-of-text → logprob`` contract.
Scoring is Arrow-batched ``mapInPandas`` with the (small, counted)
model broadcast in the closure — one scan, parallel across partitions,
no shuffle.  Filtering by an absolute threshold or by per-source
quantile band (Wikipedia-head / tail split) composes with the native
quantile gate in ops/text_analysis.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_perplexity(docs: DataFrame, lm, text_col: str = "text",
                   id_col: str = "doc_id",
                   out_col: str = "ppl") -> DataFrame:
    """(id, ppl): per-character perplexity of each document under
    ``lm`` (a CharNgramLM or anything with ``logprob(ctx, tok)``).
    exp(-mean log P) — lower = more like the training corpus."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ppls = []
            for text in pdf[text_col]:
                if not text:
                    ppls.append(float("inf"))
                    continue
                toks = list(text)
                total = 0.0
                for i, t in enumerate(toks):
                    total += lm.logprob(toks[max(0, i - lm.n + 1):i], t)
                ppls.append(math.exp(-total / len(toks)))
            yield pd.DataFrame({id_col: pdf[id_col], out_col: ppls})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} bigint, {out_col} double")


def perplexity_filter(docs: DataFrame, lm, max_ppl: float,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep documents whose perplexity under the reference LM is at
    most ``max_ppl`` — one scan + one broadcast-sized join back."""
    scored = doc_perplexity(docs, lm, text_col=text_col, id_col=id_col)
    kept = scored.filter(F.col("ppl") <= max_ppl)
    return docs.join(kept, id_col)
