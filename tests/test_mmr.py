"""MMR diversity re-rank vs an independent pure-Python reference, plus
the defining behavioral property: a near-duplicate of the top hit is
displaced by a diverse lower-scored candidate."""

import math

import pytest

from graphraft_spark.ops.similarity import mmr_rerank


def ref_mmr(cands, k, lam):
    """cands: list of (id, score, emb) — independent implementation."""
    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    pool = sorted(cands, key=lambda c: (-c[1], c[0]))
    selected, out = [], []
    while pool and len(out) < k:
        best, best_val = None, None
        for c in pool:
            pen = max((cos(c[2], s[2]) for s in selected), default=None)
            val = lam * c[1] - (1 - lam) * pen if pen is not None \
                else lam * c[1]
            if best_val is None or val > best_val:
                best, best_val = c, val
        selected.append(best)
        out.append((best[0], best_val))
        pool.remove(best)
    return out


CANDS = [
    # qid 1: ids 10/11 near-identical embeddings, 12 orthogonal
    (1, 10, 0.99, [1.0, 0.0, 0.0]),
    (1, 11, 0.98, [0.999, 0.04, 0.0]),
    (1, 12, 0.80, [0.0, 1.0, 0.0]),
    (1, 13, 0.70, [0.0, 0.9, 0.4]),
    # qid 2: single candidate
    (2, 20, 0.50, [0.5, 0.5, 0.0]),
]


def _df(spark):
    return spark.createDataFrame(
        CANDS, "qid bigint, vec_id bigint, score double, "
               "embedding array<double>")


def test_mmr_matches_reference(spark):
    got = mmr_rerank(_df(spark), k=3, lam=0.5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["qid"], r["mmr_rank"])):
        by_q.setdefault(r["qid"], []).append(r)
    for qid in (1, 2):
        cands = [(i, s, e) for q, i, s, e in CANDS if q == qid]
        want = ref_mmr(cands, k=3, lam=0.5)
        assert [r["vec_id"] for r in by_q[qid]] == [w[0] for w in want]
        for r, w in zip(by_q[qid], want):
            assert r["mmr_score"] == pytest.approx(w[1], abs=1e-12)


def test_mmr_displaces_near_duplicate(spark):
    got = {r["mmr_rank"]: r["vec_id"]
           for r in mmr_rerank(_df(spark), k=3, lam=0.5).collect()
           if r["qid"] == 1}
    # plain top-3 would be [10, 11, 12]; MMR demotes the near-dup 11
    assert got[1] == 10
    assert got[2] == 12
    assert got[3] in (11, 13)


def test_lambda_one_is_plain_topk(spark):
    got = [r["vec_id"]
           for r in mmr_rerank(_df(spark), k=3, lam=1.0).collect()
           if r["qid"] == 1]
    assert got == [10, 11, 12]


def test_mmr_custom_column_names_and_types(spark):
    """String ids, int qids, custom score column name: the output
    schema must mirror the input key types and keep score_col's name
    (regression: the schema was hardcoded bigint/bigint/'score')."""
    df = spark.createDataFrame(
        [(q, f"doc-{i}", s, e) for q, i, s, e in CANDS],
        "query_id int, doc_id string, relevance double, "
        "embedding array<double>")
    out = mmr_rerank(df, k=3, lam=0.5, qid_col="query_id",
                     id_col="doc_id", emb_col="embedding",
                     score_col="relevance")
    assert [f.simpleString() for f in out.schema.fields] == [
        "query_id:int", "doc_id:string", "relevance:double",
        "mmr_score:double", "mmr_rank:int"]
    rows = {(r["query_id"], r["mmr_rank"]): r["doc_id"]
            for r in out.collect()}
    assert rows[(1, 1)] == "doc-10"
    assert rows[(1, 2)] == "doc-12"
    assert rows[(2, 1)] == "doc-20"
