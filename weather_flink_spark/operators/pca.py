"""Distributed PCA over an embedding column (scale path: Gramian rollup).

The 100 TB shape: X is n×d with n huge and d small (64 here). The only
thing that must be distributed is the Gramian/mean accumulation — d²+d
numbers per partition — after which the eigenproblem is a driver-side
O(d³) solve on a 64×64 matrix. That is the classic tree-aggregate PCA
(same shape Spark MLlib's ``RowMatrix.computePrincipalComponents``
uses); we build it on mapInPandas + an element-wise distributed sum so
nothing driver-side ever scales with n:

1. per-partition numpy partials: (count, Σx, Σxᵀx) — one row each,
   Arrow-batched, map-side only;
2. element-wise reduction of the partials via posexplode + groupBy(pos)
   — the shuffle is ≤ partitions×(d²+d) rows, independent of n;
3. driver collects exactly d²+d+1 numbers, forms the covariance,
   ``numpy.linalg.eigh``, fixes each eigenvector's sign (largest-|.|
   component made positive — eigenvectors are only defined up to sign);
4. projection back on the cluster as a pure JVM expression
   (zip_with + aggregate over literal component arrays), so the scoring
   pass is whole-stage-codegen, no Python in the hot path.

The reference engine has no linear-algebra surface at all (its plan
body is empty — WeatherProcessingJobPlan.java:9-11); this exists for
the training-data-pipeline side of SURVEY.md §2 (embedding column ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        # acc = [n | Σx (d) | ΣxᵀX flat (d²)] — count rides the array so
        # the reduction (and the single data pass feeding it) happens once
        T.StructField("acc", T.ArrayType(T.DoubleType())),
    ]
)


def gramian_stats(df: DataFrame, col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed (count, Σx, ΣxᵀX) for an array<float> column.

    Driver memory is O(d²) regardless of row count; the reduction of
    per-partition partials happens on the cluster (groupBy over element
    position), not by collecting partials.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"acc": [np.concatenate([[float(n)], s, g.ravel()])]}
            )

    part = df.select(F.col(col).alias(col)).mapInPandas(partials, schema=_PARTIAL_SCHEMA)
    # element-wise distributed sum: ≤ P×(d²+d+1) rows shuffled, O(d²) out;
    # one data pass — the row count is slot 0 of the same reduction.
    # The cross-partition reduction goes through exact DECIMAL so the
    # Gramian (and everything the eigensolve derives from it) does not
    # depend on partition arrival order — the model is reproducible
    # across cluster configurations.
    reduced = (
        part.select(F.posexplode("acc").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("v").cast("decimal(38,18)")).cast("double").alias("v"))
        .collect()
    )
    acc = np.zeros(1 + dim + dim * dim)
    for r in reduced:
        acc[r["pos"]] = r["v"]
    n_total = int(round(acc[0]))
    return n_total, acc[1 : 1 + dim], acc[1 + dim :].reshape(dim, dim)


def fit_pca(df: DataFrame, col: str, dim: int, k: int) -> dict:
    """Top-k principal components from the distributed Gramian."""
    n, s, g = gramian_stats(df, col, dim)
    if n < 2:
        raise ValueError("need at least 2 rows to fit PCA")
    mean = s / n
    # covariance from the Gramian: (ΣxᵀX − n·μμᵀ) / (n−1)
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # k×d
    # sign canon: largest-|.| coordinate of each component made positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    var = w[order]
    total_var = float(np.clip(w.sum(), 1e-300, None))
    return {
        "n": n,
        "mean": mean,
        "components": comps,
        "explained_variance": var,
        "explained_ratio": var / total_var,
    }


def project(df: DataFrame, col: str, model: dict, prefix: str = "pc") -> DataFrame:
    """Score rows against a fitted model — pure JVM expression path.

    Each projection is aggregate(zip_with(x−μ, component, *), +): stays
    inside whole-stage codegen, no Python UDF in the n-scaled pass.
    """
    mean = [float(x) for x in model["mean"]]
    out = df
    for i, comp in enumerate(model["components"]):
        comp_lit = F.array(*[F.lit(float(c)) for c in comp])
        mean_lit = F.array(*[F.lit(m) for m in mean])
        centered = F.zip_with(F.col(col).cast("array<double>"), mean_lit, lambda a, b: a - b)
        prod = F.zip_with(centered, comp_lit, lambda a, b: a * b)
        out = out.withColumn(
            f"{prefix}{i + 1}",
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x),
        )
    return out
