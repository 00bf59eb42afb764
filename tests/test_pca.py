"""PCA fit/project: numpy parity, variance ordering, whitening, and
the pure-codegen projection plan."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(3)
    # anisotropic cloud: big variance on a known direction
    base = rng.randn(200, 8)
    base[:, 0] *= 10.0
    rows = [(i, base[i].tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return df, base


def test_fit_matches_numpy(vec_df):
    from graphraft_spark.ops.similarity import pca_fit

    df, x = vec_df
    mean, comps, eigs = pca_fit(df, k=3)
    assert np.allclose(mean, x.mean(0), atol=1e-9)
    cov = np.cov(x, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(eigs, vals[order], rtol=1e-9)
    for got, idx in zip(comps, order):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-9)
    # variance ordering: first eigenvalue dominates (the 10x axis)
    assert eigs[0] > 5 * eigs[1]


def test_project_matches_numpy_and_stays_codegen(vec_df):
    from graphraft_spark.ops.similarity import pca_fit, pca_project

    df, x = vec_df
    mean, comps, _ = pca_fit(df, k=2)
    out = pca_project(df, mean, comps)
    got = {r.vec_id: np.array(r.pca) for r in out.collect()}
    want = (x - np.array(mean)) @ np.array(comps).T
    for i in range(200):
        assert np.allclose(got[i], want[i], atol=1e-9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan  # serve path is pure codegen


def test_whitening_unit_variance(vec_df):
    from graphraft_spark.ops.similarity import pca_fit, pca_project

    df, x = vec_df
    mean, comps, _ = pca_fit(df, k=3, whiten=True)
    out = pca_project(df, mean, comps)
    y = np.stack([np.array(r.pca) for r in out.collect()])
    assert np.allclose(y.var(0, ddof=1), 1.0, atol=1e-6)
