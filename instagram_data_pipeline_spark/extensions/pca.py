"""PCA / whitening for embedding pipelines — the standard preprocessing
in front of semantic dedup and ANN (SemDedup whitens before clustering;
IVF/PQ recall improves on decorrelated dimensions).

Scale design (the MLlib treeAggregate shape):

* The d x d Gram matrix is tree-aggregated: ``mapInPandas`` computes one
  PARTIAL Gram (d^2 doubles) per Arrow batch with a single BLAS matmul —
  the only Python on executors, at the numeric-kernel boundary where
  Arrow-batched numpy beats any expression tree — then the partials
  (one small row per batch, never the vectors) reduce to a single
  d^2-element frame. Nothing vector-sized ever reaches the driver.
* Eigendecomposition happens ONCE on the driver over the d x d matrix
  (d = 64 -> 4096 doubles; model parameters, the k-means-centroid
  analog of a bounded control-plane read).
* Projection / whitening is pure codegen: a fold over the literal
  component matrix per row, no Python, no shuffle.

Eigenvector sign is canonicalized (largest-|entry| coordinate made
positive) so training is deterministic run-to-run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_vec


def gram_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(sum of outer products, sum of vectors, n) via per-batch partials.

    Each Arrow batch emits ONE row carrying its partial Gram (d^2),
    partial vector sum (d), and count; the final elementwise reduce runs
    over #batches rows. DECIMAL-exact column sums keep the reduce
    deterministic under any partitioning."""
    import pandas as pd

    head = (
        emb.select(as_double_vec(F.col(vec_col)).alias("_v"))
        .limit(1)
        .collect()
    )
    if not head:
        raise ValueError("gram_stats: empty input")
    d = len(head[0]["_v"])

    def partials(batches):
        for pdf in batches:
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            if len(m) == 0:
                continue
            yield pd.DataFrame(
                {
                    "gram": [ (m.T @ m).reshape(-1).tolist() ],
                    "vsum": [ m.sum(axis=0).tolist() ],
                    "n": [ int(len(m)) ],
                }
            )

    part = emb.select(as_double_vec(F.col(vec_col)).alias("_v")).mapInPandas(
        partials, schema="gram array<double>, vsum array<double>, n long"
    )
    part = part.localCheckpoint()  # 3 reads below; partials are tiny
    agg = (
        part.select(F.posexplode("gram").alias("i", "g"))
        .groupBy("i")
        .agg(
            F.sum(F.col("g").cast("decimal(38,12)")).cast("double").alias("g")
        )
        .orderBy("i")
    )
    gram = np.array([r.g for r in agg.collect()]).reshape(d, d)
    vs = (
        part.select(F.posexplode("vsum").alias("i", "v"))
        .groupBy("i")
        .agg(
            F.sum(F.col("v").cast("decimal(38,12)")).cast("double").alias("v")
        )
        .orderBy("i")
    )
    vsum = np.array([r.v for r in vs.collect()])
    n = part.agg(F.sum("n").alias("n")).collect()[0]["n"]
    return gram, vsum, int(n)


def pca_train(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    center: bool = True,
) -> dict:
    """Top-``k`` principal components of the embedding column.

    Covariance = Gram/n - mean meanᵀ (one distributed pass); ``eigh`` on
    the driver; components sign-canonicalized. Returns
    ``{"components": [k][d], "eigvals": [k], "mean": [d], "n": n}``."""
    gram, vsum, n = gram_stats(emb, vec_col)
    if n == 0:
        raise ValueError("pca_train: empty input")
    mean = vsum / n
    cov = gram / n
    if center:
        cov = cov - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    eigvals = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigvals.append(float(max(vals[idx], 0.0)))
    return {
        "components": comps,
        "eigvals": eigvals,
        "mean": [float(x) for x in (mean if center else np.zeros_like(mean))],
        "n": n,
    }


def project_expr(
    vec: Column,
    components: Sequence[Sequence[float]],
    mean: Optional[Sequence[float]] = None,
    eigvals: Optional[Sequence[float]] = None,
    eps: float = 1e-9,
) -> Column:
    """``array<double>`` of the vector's coordinates on each component —
    pure fold per component (codegen); pass ``eigvals`` to whiten
    (divide coordinate i by sqrt(eigval_i + eps))."""
    centered = (
        F.zip_with(
            vec,
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda x, m: x - m,
        )
        if mean is not None
        else vec
    )
    coords = []
    for i, comp in enumerate(components):
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if eigvals is not None:
            dot = dot / F.lit(float((eigvals[i] + eps) ** 0.5))
        coords.append(dot)
    return F.array(*coords)


def pca_project(
    emb: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
) -> DataFrame:
    """(id, projected array<double>) under a trained model."""
    vec = as_double_vec(F.col(vec_col))
    return emb.select(
        F.col(id_col),
        project_expr(
            vec,
            model["components"],
            model["mean"],
            model["eigvals"] if whiten else None,
        ).alias("projected"),
    )
