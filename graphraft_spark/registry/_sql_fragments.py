"""Shared DuckDB-oracle SQL fragments.

The text-analysis oracles (t_langid, t_quality_features,
p_curate_corpus, st_curation_flags, …) all agree on ONE normalization
+ tokenization + stopword-hit formulation; these fragments are that
single source of truth, interpolated into each oracle's f-string.
Lifted out of registry/textanalysis_queries.py in round 9 so the
streaming twin can import them instead of reaching across modules with
inline ``__import__`` chains (r8 verdict maintainability item).  The
engine-side counterparts live in ops/text_analysis.py — any drift
between the two renderings is caught by tools/check_oracle.py.
"""

from __future__ import annotations

from graphraft_spark.ops.text_analysis import STOPWORDS

# whitespace-normalized lowercase text / its word list — must mirror
# ops/text_analysis.py's normalization exactly
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


def _stop_sql(lang: str) -> str:
    """Stopword-hit count for ``lang`` over the normalized word list —
    the numerator of the language-ID score."""
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"len(list_filter({_WORDS}, w -> list_contains([{lst}], w)))")


# All five Gopher rules (word count, mean word length, symbol ratio,
# alpha-word ratio, required stopwords) as one boolean expression over
# a CTE that provides ``ml`` (mean word length) and ``text``.
_GOPHER_KEEP_SQL = f"""
       ((len({_WORDS}) >= 50 AND len({_WORDS}) <= 100000)
        AND (ml >= 3.0 AND ml <= 10.0)
        AND (CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
             / len({_WORDS}) <= 0.1)
        AND (CAST(len(list_filter({_WORDS},
                  w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
             / len({_WORDS}) >= 0.8)
        AND (len(list_intersect(list_distinct({_WORDS}),
             ['the','be','to','of','and','that','have','with'])) >= 2))
"""


def sgns_replay_sql(pairs_cte: str, dim: int = 4, epochs: int = 2,
                    lr: float = 0.05, negatives: int = 2,
                    seed: str = "emb0",
                    neg_distribution: str = "uniform",
                    lr_decay: bool = False,
                    subsample_t: float | None = None,
                    subsample_mode: str = "expected") -> str:
    """Unrolled-SQL replay of the full-batch SGNS trainer
    (graph/embeddings.py train_sgns) over an arbitrary pair table.
    ``pairs_cte`` is the body of a CTE producing (c, x, w DOUBLE) —
    center, context, multiplicity weight.  Per epoch: one batch CTE
    (positives + hash-drawn negative slots — the same md5 arithmetic
    as the engine, so the DRAWS are bit-identical and float drift
    cannot cascade into different examples), one scored CTE with the
    identical clipped-sigmoid gradient scalar, per-(node, position)
    gradient sums, and the update.  exp() may differ by an ulp between
    libm and the JVM and groupBy float sums reorder, so outputs are
    compared ROUNDed (6dp; per-epoch drift is ~1e-15 relative).  Same
    evidence recipe as the unrolled PageRank/PPR oracles."""
    h60 = "(('0x' || substr(md5({s}), 1, 15))::BIGINT)"
    scale = repr(0.5 / dim)
    init_cell = (
        "((" + h60.format(
            s=f"'{seed}' || node || '#' || j::VARCHAR")
        + f" % 2001 - 1000) / 1000.0) * {scale}")
    # corpus node frequencies on RAW weights — needed by the unigram75
    # noise table and/or the subsampling keep-probabilities
    freqs_sql = """,
freqs AS (
    SELECT node, SUM(w) AS freq FROM (
        SELECT c AS node, w FROM pairs
        UNION ALL SELECT x AS node, w FROM pairs
    ) GROUP BY node
)""" if (neg_distribution == "unigram75"
         or subsample_t is not None) else ""
    cdf_sql = """,
cdf AS (
    -- unigram^0.75 noise weights, all-integer intervals: two
    -- correctly-rounded sqrts (never libm pow), floor, min 1 —
    -- mirrors graph/embeddings.py train_sgns exactly
    SELECT node, wv,
           SUM(wv) OVER (ORDER BY node ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) - wv AS lo,
           SUM(wv) OVER (ORDER BY node ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS hi
    FROM (SELECT node,
                 CAST(GREATEST(FLOOR(SQRT(SQRT(
                      freq * freq * freq * 1e4))), 1) AS BIGINT) AS wv
          FROM freqs)
),
wt AS (SELECT SUM(wv) AS tw FROM cdf)""" \
        if neg_distribution == "unigram75" else ""
    # expected-weight frequent-word subsampling (deterministic form of
    # word2vec's Bernoulli thinning): training pairs scale by
    # p_keep(c)·p_keep(x), p_keep = min(1, sqrt(t·total/freq)) —
    # corpus stats above stay RAW, as in word2vec
    if subsample_t is None:
        sub_sql = ""
    elif subsample_mode == "expected":
        sub_sql = f""",
tot AS (SELECT SUM(freq) AS t FROM freqs),
spairs AS (
    SELECT p.c, p.x,
           p.w * LEAST(1.0, SQRT({subsample_t!r} * (SELECT t FROM tot)
                                 / kc.freq))
               * LEAST(1.0, SQRT({subsample_t!r} * (SELECT t FROM tot)
                                 / kx.freq)) AS w
    FROM pairs p
    JOIN freqs kc ON kc.node = p.c
    JOIN freqs kx ON kx.node = p.x
)"""
    else:
        # hash-decided Bernoulli thinning: occurrence k of pair (c, x)
        # kept iff the portable md5 uniform < p_keep(c)·p_keep(x) —
        # mirrors graph/embeddings.py subsample_mode="hash" exactly
        # (every threshold input is an exact-integer sum or one
        # correctly-rounded IEEE op, so the comparison cannot straddle)
        # the keep probability is hoisted into a projected column
        # (lambdas cannot hold subqueries), so the lambda compares the
        # per-occurrence uniform against a plain column reference
        uk = ("(('0x' || substr(md5('" + seed + "|ss|' || c || '|' "
              "|| x || '|' || k::VARCHAR), 1, 15))::BIGINT "
              "% 1000000) / 1000000.0")
        sub_sql = f""",
tot AS (SELECT SUM(freq) AS t FROM freqs),
spairs AS (
    SELECT c, x, w FROM (
        SELECT c, x,
               CAST(len(list_filter(
                   generate_series(1, CAST(w0 AS BIGINT)),
                   k -> {uk} < pkp)) AS DOUBLE) AS w
        FROM (
            SELECT p.c AS c, p.x AS x, p.w AS w0,
                   LEAST(1.0, SQRT({subsample_t!r}
                                   * (SELECT t FROM tot) / kc.freq))
                   * LEAST(1.0, SQRT({subsample_t!r}
                                     * (SELECT t FROM tot) / kx.freq))
                       AS pkp
            FROM pairs p
            JOIN freqs kc ON kc.node = p.c
            JOIN freqs kx ON kx.node = p.x
        )
    ) WHERE w > 0
)"""
    wcdf = freqs_sql + cdf_sql + sub_sql
    tp = "spairs" if subsample_t is not None else "pairs"
    parts = [f"""WITH pairs AS (
{pairs_cte}
),
vocab AS (
    SELECT c AS node FROM pairs UNION SELECT x FROM pairs
),
ranked AS (
    SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS idx FROM vocab
),
nv AS (SELECT COUNT(*) AS n FROM vocab){wcdf},
emb0 AS (
    SELECT node,
           list_transform(generate_series(0, {dim - 1}),
                          j -> {init_cell}) AS emb
    FROM vocab
)"""]
    for e in range(epochs):
        # word2vec's linear alpha schedule, full-batch analog — same
        # Python arithmetic as train_sgns, so the literals match
        alpha = lr * max(1.0 - e / epochs, 1e-4) if lr_decay else lr
        # a draw colliding with the pair's positive context is DROPPED
        # (word2vec's `if (target == word) continue` semantics) —
        # mirrors graph/embeddings.py train_sgns exactly (r10 advice:
        # collision trained the same (c,x) with label 1 and 0 in one
        # batch; r11: the drop formulation, unlike draw-shifting,
        # needs no per-example context-rank join)
        if neg_distribution == "uniform":
            neg_sql = "".join(f"""
    UNION ALL
    SELECT p.c, r.node AS x, p.w, 0.0 AS label
    FROM {tp} p JOIN ranked r
      ON r.idx = {h60.format(
          s=f"'{seed}' || p.c || '|' || p.x || '|{e}|{s}'")}
               % (SELECT n FROM nv)
    WHERE r.node <> p.x"""
                              for s in range(negatives))
        else:
            neg_sql = "".join(f"""
    UNION ALL
    SELECT p.c, r.node AS x, p.w, 0.0 AS label
    FROM {tp} p JOIN cdf r
      ON {h60.format(
          s=f"'{seed}' || p.c || '|' || p.x || '|{e}|{s}'")}
               % (SELECT tw FROM wt) >= r.lo
     AND {h60.format(
          s=f"'{seed}' || p.c || '|' || p.x || '|{e}|{s}'")}
               % (SELECT tw FROM wt) < r.hi
    WHERE r.node <> p.x"""
                              for s in range(negatives))
        parts.append(f""",
batch{e} AS (
    SELECT c, x, w, 1.0 AS label FROM {tp}{neg_sql}
),
scored{e} AS (
    SELECT b.c, b.x, ec.emb AS cemb, ex.emb AS xemb,
           ((1.0 / (1.0 + exp(-GREATEST(-20.0, LEAST(20.0,
                list_dot_product(ec.emb, ex.emb))))) - b.label)
            * b.w) * {alpha!r} AS g
    FROM batch{e} b
    JOIN emb{e} ec ON ec.node = b.c
    JOIN emb{e} ex ON ex.node = b.x
),
contrib{e} AS (
    SELECT c AS node, list_transform(xemb, v -> v * g) AS vec
    FROM scored{e}
    UNION ALL
    SELECT x AS node, list_transform(cemb, v -> v * g) AS vec
    FROM scored{e}
),
grads{e} AS (
    SELECT node, list(gv ORDER BY j) AS grad
    FROM (SELECT node, j, SUM(vec[j]) AS gv
          FROM contrib{e}, generate_series(1, {dim}) AS t(j)
          GROUP BY node, j)
    GROUP BY node
),
emb{e + 1} AS (
    SELECT v.node,
           list_transform(generate_series(1, {dim}),
                          j -> v.emb[j] - COALESCE(g2.grad[j], 0.0))
               AS emb
    FROM emb{e} v LEFT JOIN grads{e} g2 ON g2.node = v.node
)""")
    parts.append(f"""
SELECT e.node, CAST(j - 1 AS INT) AS pos, ROUND(e.emb[j], 6) AS val
FROM emb{epochs} e, generate_series(1, {dim}) AS t(j)""")
    return "".join(parts)
