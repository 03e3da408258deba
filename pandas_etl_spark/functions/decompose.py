"""Exact distributed PCA over an embedding column (SURVEY §2.9 LLM
family — the decorrelation / dimensionality-reduction step that
precedes semantic clustering, whitened-cosine dedup, and compact ANN
indexes; SemDeDup-style pipelines standardize or whiten embeddings
before clustering).

Fit is EXACT (no sampling): the covariance of N d-dim vectors is
assembled from per-batch partial moments (count, sum vector, raw
second-moment matrix), which are map-side work only — each Arrow batch
contributes one (1 + d + d*d)-float row via a single numpy matmul, and
the partials are combined by a POSITIONAL explode + sum aggregate, so
the only thing ever collected is the d + d*d + 1 combined moments
(d=64 → ~33 KB), bounded by the dimension, never by N. The d×d
eigendecomposition then runs driver-side in numpy — standard practice
for d in the embedding range (the cost is O(d^3), independent of data
size). Projection is one Arrow-vectorized matmul per batch against the
broadcast (k×d) component matrix.

Determinism: moments are float sums, so different partitionings can
differ by ulps (tests use tolerances); given the same moments, eigh
and the sign convention (largest-|coordinate| positive, ties toward
the lower index) are deterministic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel:
    """Fitted PCA: ``mean`` (d,), ``components`` (k, d) orthonormal
    rows ordered by descending eigenvalue, ``explained_var`` (k,)
    population eigenvalues."""

    def __init__(
        self,
        mean: np.ndarray,
        components: np.ndarray,
        explained_var: np.ndarray,
    ) -> None:
        self.mean = mean
        self.components = components
        self.explained_var = explained_var


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit exact population PCA on every vector of ``df[vec_col]``.

    One pass: mapInPandas emits per-batch moment rows (never the
    vectors), a positional explode + sum combines them distributed,
    and only the (1 + d + d*d) combined moments reach the driver."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    d = int(first["d"])
    if not (1 <= k <= d):
        raise ValueError(f"pca_fit: k must be in [1, {d}]")

    def moments(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            row = np.concatenate(
                ([float(len(M))], M.sum(axis=0), (M.T @ M).ravel())
            )
            yield pd.DataFrame({"m": [row.tolist()]})

    combined = (
        df.select(vec_col)
        .mapInPandas(moments, "m array<double>")
        .select(F.posexplode("m").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    vals = np.zeros(1 + d + d * d)
    for r in combined:
        vals[r["pos"]] = r["v"]
    n = vals[0]
    if n < 1:
        raise ValueError("pca_fit: empty input")
    mean = vals[1 : 1 + d] / n
    cov = vals[1 + d :].reshape(d, d) / n - np.outer(mean, mean)
    # symmetrize against float residue before eigh
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # sign convention: the largest-|coordinate| entry is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean, comps, np.maximum(evals[order], 0.0))


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
) -> DataFrame:
    """Append ``out_col`` = the centered projection (optionally
    whitened to unit variance per component) of ``vec_col`` onto the
    fitted components — one broadcast numpy matmul per Arrow batch."""
    W = model.components.copy()
    if whiten:
        scale = np.sqrt(np.maximum(model.explained_var, 1e-12))
        W = W / scale[:, None]
    mean = model.mean

    @F.pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        P = (M - mean) @ W.T
        return pd.Series(list(P))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
