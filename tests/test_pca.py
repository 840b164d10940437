"""Distributed PCA (operators/pca.py) vs an all-numpy twin.

The distributed path must agree with a single-process numpy PCA on the
same rows: same Gramian, same covariance, same (sign-canonical)
components, same projections — up to float reduction order, hence
allclose rather than bit equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from weather_flink_spark.io import load
from weather_flink_spark.operators import pca

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load(spark, SF, "embeddings")
    rows = df.select("vec_id", "embedding").collect()
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    return df, x, ids


def numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    c = x - mean
    cov = c.T @ c / (x.shape[0] - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def test_gramian_matches_numpy(spark, emb):
    df, x, _ = emb
    n, s, g = pca.gramian_stats(df, "embedding", dim=64)
    assert n == x.shape[0]
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-9)


def test_components_match_numpy(spark, emb):
    df, x, _ = emb
    model = pca.fit_pca(df, "embedding", dim=64, k=4)
    mean, comps, var = numpy_pca(x, 4)
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9)
    # spectrum must agree; eigenvectors may differ only if eigenvalues tie
    np.testing.assert_allclose(model["explained_variance"], var, rtol=1e-6)
    np.testing.assert_allclose(model["components"], comps, atol=1e-6)
    ratios = model["explained_ratio"]
    assert (ratios > 0).all() and ratios.sum() <= 1.0 + 1e-9


def test_projection_matches_numpy(spark, emb):
    df, x, ids = emb
    model = pca.fit_pca(df, "embedding", dim=64, k=4)
    out = pca.project(df, "embedding", model).select("vec_id", "pc1", "pc2", "pc3", "pc4")
    got = {r["vec_id"]: [r["pc1"], r["pc2"], r["pc3"], r["pc4"]] for r in out.collect()}
    expected = (x - model["mean"]) @ np.asarray(model["components"]).T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[int(vid)], expected[i], atol=1e-8)


def test_projection_plan_is_jvm_side(spark, emb):
    """The n-scaled scoring pass must not re-enter Python."""
    df, _, _ = emb
    model = pca.fit_pca(df, "embedding", dim=64, k=2)
    out = pca.project(df, "embedding", model)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_power_components_match_eigh(spark, emb):
    """The oracle-replayable power path converges to the true PCA: each
    component aligns with the eigh eigenvector on the SAME quantized
    data to |cos| >= 0.999 (600 iters at gap ratios ~0.96-0.99)."""
    df, x, _ = emb
    xq = np.round(x, 6)
    dfq = pca.quantize_embeddings(df, "embedding", dim=64)
    model = pca.fit_pca_power(dfq, "embedding", dim=64, k=4)
    mean, comps, var = numpy_pca(xq, 4)
    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(model["lambdas"], var, rtol=1e-4)
    for i in range(4):
        cos = abs(float(np.dot(comps[i], np.asarray(model["components"][i]))))
        assert cos >= 0.999, (i, cos)


def test_exact_gramian_partition_invariance(spark, emb):
    """The integer Gramian must be bit-identical under any partitioning
    — the reproducibility claim a float Gramian cannot make."""
    df, _, _ = emb
    a = pca.exact_gramian(pca.quantize_embeddings(df, "embedding", 64), "embedding", 64)
    b = pca.exact_gramian(
        pca.quantize_embeddings(df.repartition(13), "embedding", 64), "embedding", 64
    )
    assert a == b


def test_power_fold_matches_scalar_loop():
    """The numpy-vectorized iteration in fit_pca_power must be bit-equal
    to the scalar fold the SQL oracle replays (no BLAS/FMA drift)."""
    import math

    rng = np.random.default_rng(7)
    d = 16
    c = np.round(rng.normal(size=(d, d)), 9)
    c = (c + c.T) / 2
    v_np = np.ones(d)
    v_py = [1.0] * d
    for _ in range(50):
        # vectorized (as in fit_pca_power)
        w_np = np.zeros(d)
        for j in range(d):
            w_np = w_np + c[:, j] * v_np[j]
        ss = 0.0
        for i in range(d):
            ss = ss + float(w_np[i]) * float(w_np[i])
        v_np = w_np / np.float64(np.sqrt(ss))
        # scalar (as in the DuckDB fold)
        w_py = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc = acc + c[i][j] * v_py[j]
            w_py.append(acc)
        ss2 = 0.0
        for i in range(d):
            ss2 = ss2 + w_py[i] * w_py[i]
        nrm = math.sqrt(ss2)
        v_py = [w_py[i] / nrm for i in range(d)]
        assert all(float(v_np[i]) == v_py[i] for i in range(d))
