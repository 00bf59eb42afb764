"""End-to-end corpus curation verdict — the composed recipe every
published pretraining pipeline runs some variant of (C4 §2.2, Gopher
A1.1, CCNet, Dolma): per-document quality gates + language filter +
exact dedup + benchmark decontamination, fused into the minimal number
of passes and emitted as an AUDITABLE flag frame (per-stage booleans,
not a silently filtered corpus — curation reports need per-rule kill
counts).

Fusion plan (the 100 TB shape):

* stage-1 flags (C4 doc gate, all Gopher rules, language) are pure
  column expressions → ONE corpus scan, zero shuffles, whole-stage
  codegen (``gopher_rules`` / ``c4_doc_gate`` / ``langid_scores`` are
  the expression-level builders the standalone operators project);
* exact dedup adds a content-hash window → the scan's ONE keyed
  shuffle;
* decontamination is the only second corpus pass (its gram explode is
  a different row grain), a broadcast-gram semi-aggregate
  (``contamination_flags``) joined back on the id.

So: two corpus scans, one content-key shuffle, one id-keyed join —
versus five scans + four joins for the naive stage-by-stage chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def curate_corpus(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  allowed_langs: tuple[str, ...] = ("en",),
                  lang_expr: Column | None = None,
                  n: int = 13, hashed: bool = False,
                  gopher_min_words: int = 50,
                  bloom: bool = False,
                  bloom_bits: int = 1 << 22,
                  decontaminate: str | None = None) -> DataFrame:
    """Per-document curation verdict: (id, c4_kept, gopher_kept,
    lang_pred, ok_lang, is_canonical, contaminated, n_hits,
    keep_final) where ``keep_final`` is the conjunction — C4 doc gates
    pass, all Gopher rules pass, predicted language allowed, document
    is the canonical copy of its exact-duplicate group, and no
    benchmark n-gram appears in it.

    ``lang_expr`` overrides the language prediction expression (e.g. a
    rounded-score variant for engine-portable tie order); default is
    :func:`~graphraft_spark.ops.text_analysis.predicted_lang`.

    ``decontaminate`` picks the decontamination stage: ``"direct"``
    (broadcast the benchmark gram set — the measured scale default),
    ``"bloom"`` (fixed-bitmap prefilter + exact verify, identical
    output), or ``"auto"`` — derive the path from the benchmark's own
    size via :func:`~graphraft_spark.ops.decontaminate.
    choose_decontamination` (one approx_count_distinct over the SMALL
    side + the measured ≳1e8-gram crossover + the 10×-bits fp-sizing
    rule), the same self-tuning shape as dedup's
    ``adaptive_bucket_cap``.  ``None`` defers to the legacy ``bloom``
    flag; an explicit ``bloom_bits`` is honored on the bloom path
    unless auto derived one."""
    from graphraft_spark.ops.dedup import exact_dedup
    from graphraft_spark.ops.decontaminate import (bloom_decontaminate,
                                                   choose_decontamination,
                                                   contamination_flags)
    from graphraft_spark.ops.text_analysis import (c4_doc_gate,
                                                   gopher_rules,
                                                   predicted_lang)

    t = F.col(text_col)
    lang = lang_expr if lang_expr is not None else predicted_lang(t)
    flags = docs.select(
        F.col(id_col), t,
        c4_doc_gate(t).alias("c4_kept"),
        gopher_rules(t, min_words=gopher_min_words)["keep"]
        .alias("gopher_kept"),
        lang.alias("lang_pred"))
    flags = exact_dedup(flags, text_col, id_col) \
        .drop(text_col, "content_key")
    mode = decontaminate if decontaminate is not None \
        else ("bloom" if bloom else "direct")
    if mode == "auto":
        mode, auto_bits = choose_decontamination(
            benchmark, n=n, text_col=text_col, hashed=hashed)
        if mode == "bloom":
            bloom_bits = auto_bits
    if mode not in ("direct", "bloom"):
        raise ValueError(f"unknown decontaminate mode {mode!r}")
    if mode == "bloom":
        cont = bloom_decontaminate(docs, benchmark, n=n,
                                   text_col=text_col, id_col=id_col,
                                   hashed=hashed, num_bits=bloom_bits)
    else:
        cont = contamination_flags(docs, benchmark, n=n,
                                   text_col=text_col, id_col=id_col,
                                   hashed=hashed)
    ok_lang = F.col("lang_pred").isin(*allowed_langs)
    return (flags.join(cont, id_col)
            .select(id_col, "c4_kept", "gopher_kept", "lang_pred",
                    ok_lang.alias("ok_lang"), "is_canonical",
                    "contaminated", "n_hits",
                    (F.col("c4_kept") & F.col("gopher_kept") & ok_lang
                     & F.col("is_canonical") & ~F.col("contaminated"))
                    .alias("keep_final")))
