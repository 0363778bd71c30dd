"""Embedding operators: normalisation, int8 quantisation error bound,
PCA recovery of a planted low-rank structure, projection parity with
numpy, and partitioning invariance of the distributed covariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marex_spark.operators.embed import (
    dequantize_int8,
    embedding_normalize,
    pca_fit,
    pca_project,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    # planted rank-2 structure in 8-d + small noise
    basis = rng.normal(size=(2, 8))
    coef = rng.normal(size=(300, 2)) * np.array([5.0, 2.0])
    X = coef @ basis + rng.normal(scale=0.05, size=(300, 8)) + 1.5
    rows = [(i, [float(v) for v in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, X


def test_normalize_unit_and_zero(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = embedding_normalize(df).orderBy("vec_id").collect()
    assert abs(out[0].embedding[0] - 0.6) < 1e-6
    assert out[1].embedding == [0.0, 0.0]  # zero vector untouched


def test_quantize_roundtrip_error_bound(vecs):
    df, X = vecs
    q = quantize_int8(df)
    back = dequantize_int8(q, out_col="deq").collect()
    for r in back:
        v = np.array(r.embedding, dtype=np.float64)
        dq = np.array(r.deq, dtype=np.float64)
        assert np.all(np.abs(v - dq) <= r.scale / 2 + 1e-9)
        assert max(abs(x) for x in np.array(r.qvec)) <= 127


def test_pca_recovers_planted_rank(vecs):
    df, X = vecs
    m = pca_fit(df, k=4)
    ev = m["explained_variance"]
    # two planted directions dominate the noise floor
    assert ev[0] > ev[2] * 50 and ev[1] > ev[2] * 50
    # parity with numpy eig on the exact covariance
    cov = np.cov(X.T, bias=True)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(ev, w[:4], rtol=1e-6)


def test_pca_project_matches_numpy_and_is_partition_invariant(vecs):
    df, X = vecs
    m = pca_fit(df, k=2)
    m2 = pca_fit(df.repartition(13), k=2)
    np.testing.assert_allclose(m["components"], m2["components"], atol=1e-9)
    out = pca_project(df, m).orderBy("vec_id").collect()
    got = np.array([r.projected for r in out])
    want = (X - m["mean"]) @ m["components"].T
    np.testing.assert_allclose(got, want, atol=1e-4)
    # projected variance equals the eigenvalues
    np.testing.assert_allclose(
        got.var(axis=0), m["explained_variance"], rtol=1e-3
    )
