"""Distributed logistic-regression trainer + codegen scorer — the
model-free quality-classifier pipeline (the FineWeb-Edu shape: featurize
text, train a tiny linear model against a cheap label source, score the
whole corpus with it).

The reference repo's only classifier is GPT-4 itself
(instagram_pipeline/analysis/interest_analyzer.py) — at 100 TB you
distill such labels into a linear head over cheap features
(extensions/ranking.hashed_tf_vectors here) and score with pure column
arithmetic.

Scale design (same treeAggregate shape as extensions/pca.py):

* Each Arrow batch computes ONE partial gradient with a BLAS matvec —
  the only executor Python, at the numeric-kernel boundary — and the
  d+2 partial scalars reduce decimal-exact, so the gradient (and hence
  the whole training run) is deterministic under any partitioning.
* Weights update on the driver (d+1 doubles, model parameters); fixed
  full-batch iterations, no RNG.
* Scoring is a per-row fold over literal weights (whole-stage codegen,
  no Python, no shuffle). The LOGIT is exact engine-portable
  arithmetic; the sigmoid is monotone in it, so decisions threshold on
  logit >= 0.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grad_stats(
    df: DataFrame, feat_col: str, label_col: str, w: np.ndarray, b: float
) -> tuple[np.ndarray, float, float, int]:
    """(sum_x residual*x, sum residual, log-loss sum, n) in one pass.
    residual = sigmoid(w.x + b) - y."""
    import pandas as pd

    bw = list(map(float, w))

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_x"]]
            )
            y = pdf["_y"].to_numpy(dtype=np.float64)
            z = X @ np.asarray(bw) + b
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            eps = 1e-12
            loss = -(
                y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
            ).sum()
            yield pd.DataFrame(
                {
                    "g": [(X.T @ r).tolist()],
                    "rb": [float(r.sum())],
                    "loss": [float(loss)],
                    "n": [int(len(y))],
                }
            )

    part = (
        df.select(
            F.col(feat_col).alias("_x"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .mapInPandas(
            partials,
            schema="g array<double>, rb double, loss double, n long",
        )
        .localCheckpoint()
    )
    gagg = (
        part.select(F.posexplode("g").alias("i", "v"))
        .groupBy("i")
        .agg(
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double").alias("v")
        )
        .orderBy("i")
    )
    g = np.array([r.v for r in gagg.collect()])
    scalars = part.agg(
        F.sum(F.col("rb").cast("decimal(38,12)")).cast("double").alias("rb"),
        F.sum(F.col("loss").cast("decimal(38,12)"))
        .cast("double")
        .alias("loss"),
        F.sum("n").alias("n"),
    ).collect()[0]
    return g, float(scalars.rb), float(scalars.loss), int(scalars.n)


def logit_train(
    df: DataFrame,
    feat_col: str,
    label_col: str,
    iters: int = 25,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Full-batch gradient descent, fixed ``iters``; returns
    ``{"weights": [d], "bias": b, "loss_curve": [...], "n": n}``.
    Deterministic for a fixed input (decimal-exact gradient reduce,
    no sampling)."""
    head = df.select(F.col(feat_col)).limit(1).collect()
    if not head:
        raise ValueError("logit_train: empty input")
    d = len(head[0][0])
    w = np.zeros(d)
    b = 0.0
    curve = []
    n_total = None
    for _ in range(iters):
        g, rb, loss, n = _grad_stats(df, feat_col, label_col, w, b)
        n_total = n
        curve.append(loss / n)
        w = w * (1.0 - lr * l2) - lr * g / n
        b = b - lr * rb / n
    return {
        "weights": [float(x) for x in w],
        "bias": float(b),
        "loss_curve": curve,
        "n": n_total,
    }


def logit_expr(vec: Column, weights: Sequence[float], bias: float) -> Column:
    """The raw logit w.x + b as a codegen fold over literal weights."""
    return (
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in weights]),
                lambda x, wt: x * wt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(float(bias))
    )


def logit_score(
    df: DataFrame,
    model: dict,
    feat_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, logit, keep) — keep iff logit >= 0 (sigmoid is monotone, so
    the integer-exact decision avoids cross-engine exp() rounding)."""
    z = logit_expr(F.col(feat_col), model["weights"], model["bias"])
    return df.select(
        F.col(id_col),
        F.round(z, 6).alias("logit"),
        (z >= 0).alias("keep"),
    )
