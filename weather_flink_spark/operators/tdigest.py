"""Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
Extremely Accurate Quantiles Using t-Digests", 2019).

The continuous-aggregate pattern for quantiles: a daily rollup job
persists one O(delta) digest per (group, day) — never the raw values —
and any coarser grain (per-group totals, monthly, all-time) is a
re-merge of those digests.  Exact percentiles can't do this (they need
every value); Spark's ``percentile_approx`` computes a GK sketch but
does not expose it as persistable/mergeable state.  This is the
quantile sibling of the HLL rollup (``q_agg_hll_mergeable``).

Both stages are Arrow-batched ``applyInPandas`` kernels:

* stage 1 partitions by (group, sub) and compresses each partition's
  values into <= ~2*delta centroids with the k1 scale function
  ``k(q) = (delta / 2pi) * asin(2q - 1)`` — cluster sizes taper toward
  the tails, which is what makes p99/p999 accurate;
* stage 2 partitions by group, concatenates the daily centroid lists,
  and runs the same merge-compress over (mean, weight) pairs.

Everything is deterministic: values sort stably, the greedy merge is
order-independent after the sort, and no randomness is involved — so
tests can pin exact outputs and re-merges reproduce byte-identically.

At scale: stage 1's shuffle is the rollup's own grouping (already
paid); stage 2 moves only O(groups x delta) centroid rows.  The digest
table is the only persisted state, re-mergeable without raw data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _k(q: np.ndarray | float, delta: float):
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.asarray(q) - 1.0)


def _q_limit(q0: float, delta: float) -> float:
    """Right edge of a cluster starting at cumulative fraction q0."""
    k1 = float(_k(q0, delta)) + 1.0
    if k1 >= delta / 4.0:  # asin domain edge -> tail singleton region
        return 1.0
    return (math.sin(2.0 * math.pi * k1 / delta) + 1.0) / 2.0


def compress(means: np.ndarray, weights: np.ndarray, delta: float):
    """Merge (mean, weight) pairs into <= ~2*delta t-digest centroids.

    Greedy left-to-right pass over mean-sorted input; a cluster absorbs
    the next point while its cumulative span stays within one unit of
    the k1 scale function.  Deterministic for any fixed input multiset.
    """
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    acc_m, acc_w = means[0], weights[0]
    q0 = 0.0
    qlim = _q_limit(q0, delta)
    cum = float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        if (cum + w) / total <= qlim:
            acc_m += (m - acc_m) * (w / (acc_w + w))
            acc_w += w
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            q0 += acc_w / total
            qlim = _q_limit(q0, delta)
            acc_m, acc_w = m, w
        cum += w
    out_m.append(acc_m)
    out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


def estimate(means: np.ndarray, weights: np.ndarray, qs: list[float]) -> list[float]:
    """Quantiles from centroids: linear interpolation between centroid
    midpoints in cumulative-weight space, clamped to the extreme means."""
    total = weights.sum()
    mids = np.cumsum(weights) - weights / 2.0
    out = []
    for q in qs:
        t = q * total
        if t <= mids[0]:
            out.append(float(means[0]))
        elif t >= mids[-1]:
            out.append(float(means[-1]))
        else:
            out.append(float(np.interp(t, mids, means)))
    return out


DIGEST_SCHEMA = (
    "group string, sub string, means array<double>, weights array<double>"
)
EST_SCHEMA = "group string, n_subs int, n_centroids int, q double, est double"


def tdigest_quantiles(
    df: DataFrame,
    group_col: str,
    sub_col,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    delta: float = 200.0,
) -> DataFrame:
    """Two-stage mergeable quantile rollup.

    ``df[group_col]`` is the rollup grain, ``sub_col`` (a Column, e.g.
    ``to_date(ts)``) the partial-digest grain, ``value_col`` the metric.
    Returns one row per (group, q) with the merged-digest estimate.
    """
    qs_list = list(qs)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["__v"].to_numpy(dtype=np.float64)
        m, w = compress(v, np.ones_like(v), delta)
        return pd.DataFrame(
            {
                "group": [pdf["__g"].iloc[0]],
                "sub": [pdf["__s"].iloc[0]],
                "means": [m.tolist()],
                "weights": [w.tolist()],
            }
        )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x) for x in pdf["weights"]])
        m, w = compress(m, w, delta)
        ests = estimate(m, w, qs_list)
        return pd.DataFrame(
            {
                "group": pdf["group"].iloc[0],
                "n_subs": len(pdf),
                "n_centroids": len(m),
                "q": qs_list,
                "est": ests,
            }
        )

    prepared = df.select(
        F.col(group_col).cast("string").alias("__g"),
        sub_col.cast("string").alias("__s"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    digests = prepared.groupBy("__g", "__s").applyInPandas(_build, DIGEST_SCHEMA)
    return digests.groupBy("group").applyInPandas(_merge, EST_SCHEMA)
