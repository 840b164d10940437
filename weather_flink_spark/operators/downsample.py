"""Largest-Triangle-Three-Buckets (LTTB) series downsampling.

LTTB (Steinarsson 2013, "Downsampling Time Series for Visual
Representation") keeps the first and last point of a series and, for
each of ``n_out - 2`` interior buckets, the point forming the largest
triangle with the previously selected point and the average of the
next bucket — the standard shape-preserving downsampler.

Selection is sequential (each pick anchors the next triangle), so the
kernel is per-series pandas inside ``applyInPandas``: Spark partitions
by series key, Arrow moves each group once, and the O(n) scan runs in
numpy. The distribution contract is "one series fits one executor" —
the same contract every per-series stateful operator here uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

LTTB_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, sel_rank int"
)


def _lttb_indices(x: np.ndarray, y: np.ndarray, n_out: int) -> list[int]:
    n = len(x)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        return [0, n - 1]
    # bucket boundaries over the interior points [1, n-1)
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    selected = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nxt_lo, nxt_hi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds) else n)
        if nxt_hi <= nxt_lo:
            nxt_lo, nxt_hi = n - 1, n
        # sequential left folds (not numpy pairwise mean) so the exact
        # op order is replayable by a SQL list_reduce oracle
        accx = 0.0
        for v in x[nxt_lo:nxt_hi]:
            accx = accx + v
        avg_x = accx / (nxt_hi - nxt_lo)
        accy = 0.0
        for v in y[nxt_lo:nxt_hi]:
            accy = accy + v
        avg_y = accy / (nxt_hi - nxt_lo)
        ax, ay = float(x[a]), float(y[a])
        # twice the triangle area; ties resolved to the earliest point
        areas = np.abs(
            (ax - avg_x) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (avg_y - ay)
        )
        a = lo + int(np.argmax(areas))
        selected.append(a)
    selected.append(n - 1)
    return selected


def lttb(
    events: DataFrame,
    n_out: int = 12,
    series_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Downsample each series to ``n_out`` shape-preserving points."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        x = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[val_col].to_numpy(dtype=np.float64)
        idx = _lttb_indices(x, y, n_out)
        out = pdf.iloc[idx][[series_col, id_col, ts_col, val_col]].copy()
        out["sel_rank"] = np.arange(len(idx), dtype=np.int32)
        return out

    return (
        events.select(series_col, id_col, ts_col, val_col)
        .groupBy(series_col)
        .applyInPandas(kernel, schema=LTTB_SCHEMA)
    )


def _holt_schema(series_col: str) -> str:
    # series key carried through as long — every series id in the testdata
    # model (user_id, event_id, vec_id) is integral
    return f"{series_col} long, n_obs long, level double, trend double, forecast_next double"


# kept for callers that referenced the module constant (user_id series)
HOLT_SCHEMA = _holt_schema("user_id")


def holt_forecast(
    events: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    series_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per series.

    The recursion (s_t, b_t depend on s_{t-1}, b_{t-1}) is sequential,
    so like :func:`lttb` it runs per-series in ``applyInPandas``.
    Series with fewer than 2 points are dropped (no trend defined).
    Returns the final state and the one-step-ahead forecast.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        y = pdf[val_col].to_numpy(dtype=np.float64)
        if len(y) < 2:
            return pd.DataFrame(
                columns=[series_col, "n_obs", "level", "trend", "forecast_next"]
            )
        s, b = y[0], y[1] - y[0]
        for x in y[1:]:
            s_prev = s
            s = alpha * x + (1 - alpha) * (s + b)
            b = beta * (s - s_prev) + (1 - beta) * b
        return pd.DataFrame(
            {
                series_col: [int(pdf[series_col].iloc[0])],
                "n_obs": [len(y)],
                "level": [s],
                "trend": [b],
                "forecast_next": [s + b],
            }
        )

    return (
        events.select(series_col, id_col, ts_col, val_col)
        .groupBy(series_col)
        .applyInPandas(kernel, schema=_holt_schema(series_col))
    )


def _hw_schema(series_col: str) -> str:
    return (
        f"{series_col} string, n_obs long, level double, trend double,"
        " season_amplitude double, forecast_next double"
    )


# kept for callers that referenced the module constant (event_type series)
HW_SCHEMA = _hw_schema("event_type")


def holt_winters_forecast(
    hourly: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.2,
    gamma: float = 0.3,
    period: int = 24,
    series_col: str = "event_type",
    idx_col: str = "hour_idx",
    val_col: str = "hourly_avg",
) -> DataFrame:
    """Additive Holt-Winters (level + trend + seasonal) per series.

    Classic initialization: level = mean of the first season, trend =
    (mean of season 2 - mean of season 1) / period, seasonal components
    = first-season deviations from its mean; the triple recursion then
    folds the remaining observations. Like :func:`holt_forecast` the
    recursion is order-sequential, so each series runs as one pandas
    group in ``applyInPandas`` (one Arrow transfer per series; the
    pre-aggregated hourly series is period-bounded, not event-bounded,
    so group size is fixed regardless of raw-data scale). Series
    shorter than two full seasons are dropped (no seasonal estimate).
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        y = pdf[val_col].to_numpy(dtype=np.float64)
        m = period
        if len(y) < 2 * m:
            return pd.DataFrame(
                columns=[
                    series_col,
                    "n_obs",
                    "level",
                    "trend",
                    "season_amplitude",
                    "forecast_next",
                ]
            )
        # sequential left folds (not numpy pairwise mean) so the exact
        # op order is replayable by a SQL list_reduce oracle
        acc1 = 0.0
        for v in y[:m]:
            acc1 = acc1 + v
        m1 = acc1 / m
        acc2 = 0.0
        for v in y[m : 2 * m]:
            acc2 = acc2 + v
        m2 = acc2 / m
        s = m1
        b = (m2 - m1) / m
        seas = (y[:m] - m1).astype(np.float64)
        for t in range(m, len(y)):
            c_idx = t % m
            s_prev = s
            s = alpha * (y[t] - seas[c_idx]) + (1 - alpha) * (s + b)
            b = beta * (s - s_prev) + (1 - beta) * b
            seas[c_idx] = gamma * (y[t] - s) + (1 - gamma) * seas[c_idx]
        return pd.DataFrame(
            {
                series_col: [str(pdf[series_col].iloc[0])],
                "n_obs": [len(y)],
                "level": [s],
                "trend": [b],
                "season_amplitude": [float(seas.max() - seas.min())],
                "forecast_next": [s + b + seas[len(y) % m]],
            }
        )

    return (
        hourly.select(series_col, idx_col, val_col)
        .groupBy(series_col)
        .applyInPandas(kernel, schema=_hw_schema(series_col))
    )
