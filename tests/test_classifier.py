"""Logistic-regression trainer/scorer: convergence on planted-separable
data, gradient exactness, determinism, decision semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.classifier import (
    logit_score,
    logit_train,
)


@pytest.fixture(scope="module")
def separable(spark):
    """y = 1 iff x0 + x1 > 0, margin >= 0.5 — linearly separable."""
    rng = np.random.RandomState(3)
    rows = []
    for i in range(300):
        x = rng.randn(4)
        s = x[0] + x[1]
        if abs(s) < 0.5:
            x[0] += 0.5 if s >= 0 else -0.5
            s = x[0] + x[1]
        rows.append((i, [float(v) for v in x], 1 if s > 0 else 0))
    return spark.createDataFrame(
        rows, "doc_id long, x array<double>, y int"
    )


def test_trainer_converges_and_separates(spark, separable):
    model = logit_train(separable, "x", "y", iters=30, lr=1.0)
    curve = model["loss_curve"]
    assert curve[-1] < curve[0] * 0.5  # loss halves at least
    scored = logit_score(separable, model, "x").join(
        separable.select("doc_id", "y"), "doc_id"
    )
    acc = scored.filter(
        (F.col("keep") & (F.col("y") == 1))
        | (~F.col("keep") & (F.col("y") == 0))
    ).count() / separable.count()
    assert acc >= 0.95
    # learned weights point along the planted direction x0 + x1
    w = model["weights"]
    assert w[0] > 0 and w[1] > 0
    assert abs(w[0]) > abs(w[2]) and abs(w[1]) > abs(w[3])


def test_training_is_partition_invariant(spark, separable):
    m1 = logit_train(separable, "x", "y", iters=5, lr=0.5)
    m2 = logit_train(separable.repartition(11), "x", "y", iters=5, lr=0.5)
    np.testing.assert_allclose(m1["weights"], m2["weights"], rtol=1e-12)
    assert m1["bias"] == pytest.approx(m2["bias"], rel=1e-12)


def test_score_decision_thresholds_on_logit_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 0.0])],
        "doc_id long, x array<double>",
    )
    model = {"weights": [2.0, 0.0], "bias": 0.0}
    got = {r.doc_id: (r.logit, r.keep) for r in
           logit_score(df, model, "x").collect()}
    assert got[1] == (2.0, True)
    assert got[2] == (-2.0, False)
    assert got[3] == (0.0, True)  # boundary keeps (>= 0)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "doc_id long, x array<double>, y int")
    with pytest.raises(ValueError, match="empty"):
        logit_train(df, "x", "y")
