"""PCA trainer/projection: recovered structure, orthonormality,
whitening, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.pca import (
    gram_stats,
    pca_project,
    pca_train,
)


@pytest.fixture(scope="module")
def planted(spark):
    """200 vectors in R^6 with variance concentrated on two known axes."""
    rng = np.random.RandomState(7)
    n = 200
    a = rng.randn(n) * 5.0
    b = rng.randn(n) * 2.0
    noise = rng.randn(n, 6) * 0.05
    basis_a = np.array([1, 1, 0, 0, 0, 0]) / np.sqrt(2)
    basis_b = np.array([0, 0, 1, -1, 0, 0]) / np.sqrt(2)
    m = np.outer(a, basis_a) + np.outer(b, basis_b) + noise + 0.5
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, m


def test_gram_stats_match_numpy(spark, planted):
    df, m = planted
    gram, vsum, n = gram_stats(df)
    assert n == len(m)
    np.testing.assert_allclose(gram, m.T @ m, rtol=1e-9)
    np.testing.assert_allclose(vsum, m.sum(axis=0), rtol=1e-9)


def test_pca_recovers_planted_axes_in_order(spark, planted):
    df, m = planted
    model = pca_train(df, k=3)
    vals = model["eigvals"]
    assert vals[0] > vals[1] > vals[2]  # variance-ordered
    c0 = np.array(model["components"][0])
    c1 = np.array(model["components"][1])
    basis_a = np.array([1, 1, 0, 0, 0, 0]) / np.sqrt(2)
    basis_b = np.array([0, 0, 1, -1, 0, 0]) / np.sqrt(2)
    assert abs(float(c0 @ basis_a)) > 0.99
    assert abs(float(c1 @ basis_b)) > 0.99
    # orthonormal
    assert float(c0 @ c0) == pytest.approx(1.0, abs=1e-9)
    assert float(c0 @ c1) == pytest.approx(0.0, abs=1e-9)


def test_projection_matches_numpy_and_whitening_unit_variance(spark, planted):
    df, m = planted
    model = pca_train(df, k=2)
    got = {
        r.vec_id: list(r.projected)
        for r in pca_project(df, model).collect()
    }
    comps = np.array(model["components"])
    mean = np.array(model["mean"])
    want = (m - mean) @ comps.T
    for i in range(len(m)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-8, atol=1e-8)
    # whitened coordinates have ~unit variance on every kept axis
    white = np.array(
        [
            r.projected
            for r in pca_project(df, model, whiten=True)
            .orderBy("vec_id")
            .collect()
        ]
    )
    np.testing.assert_allclose(white.var(axis=0), 1.0, rtol=0.05)


def test_pca_deterministic_and_sign_canonical(spark, planted):
    df, _ = planted
    m1 = pca_train(df, k=2)
    m2 = pca_train(df.repartition(7), k=2)  # partitioning must not matter
    np.testing.assert_allclose(m1["components"], m2["components"], rtol=1e-9)
    np.testing.assert_allclose(m1["eigvals"], m2["eigvals"], rtol=1e-9)
    for c in m1["components"]:
        pivot = int(np.argmax(np.abs(c)))
        assert c[pivot] > 0  # canonical sign


def test_pca_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_train(df, k=2)
