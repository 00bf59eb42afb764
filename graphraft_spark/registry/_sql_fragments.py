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
