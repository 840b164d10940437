"""Largest-Triangle-Three-Buckets (LTTB) series downsampling.

LTTB (Steinarsson 2013, "Downsampling Time Series for Visual
Representation") keeps the first and last point of a series and, for
each of ``n_out - 2`` interior buckets, the point forming the largest
triangle with the previously selected point and the average of the
next bucket — the standard shape-preserving downsampler.

Selection is sequential (each pick anchors the next triangle), so the
kernel is per-series pandas/numpy. The distribution contract is "one
series fits one executor". Crossing shape (r8 verdict task #2, the
wave-46 standing rule): per-series ``applyInPandas`` groups each pay
~ms of Arrow round-trip (1500-1800 series = seconds of pure overhead),
so every operator here first collapses each series to ONE row
(``sort_array(collect_list(struct(...)))`` — the sort IS the kernel's
old ``sort_values``) and runs the identical sequential kernel inside
``mapInPandas`` over 32 hash partitions: 32 Python crossings total,
any number of series. Kernels are order-pinned, so results are
bit-identical to the per-group form (oracle hashes unchanged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    # ONE row per series before the Python crossing (module doc):
    # sort_array on (t_us, event_id, value) structs == the kernel's
    # old sort_values([ts, id]) — (t_us, id) is a unique key, so the
    # third field never participates in ordering.
    ser = (
        events.select(
            series_col,
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t_us"),
                F.col(id_col).alias("eid"),
                F.col(val_col).alias("v"),
            ).alias("p"),
        )
        .groupBy(series_col)
        .agg(F.sort_array(F.collect_list("p")).alias("seq"))
        .select(
            series_col,
            F.col("seq.t_us").alias("ts_us"),
            F.col("seq.eid").alias("eids"),
            F.col("seq.v").alias("vals"),
        )
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        for _, row in pdf.iterrows():
            ts_us = np.asarray(row["ts_us"], dtype=np.int64)
            # epoch NANOS as double — exactly the old kernel's
            # datetime64[ns].astype(int64) x axis (and the oracle's
            # CAST(epoch_ns(ts) AS DOUBLE)); int64 ns first, then the
            # same one float64 conversion
            x = (ts_us * 1000).astype(np.float64)
            y = np.asarray(row["vals"], dtype=np.float64)
            eids = np.asarray(row["eids"], dtype=np.int64)
            key = int(row[series_col])
            for r, i in enumerate(_lttb_indices(x, y, n_out)):
                out.append((key, int(eids[i]), int(ts_us[i]), float(y[i]), r))
        return pd.DataFrame(
            out, columns=[series_col, id_col, "t_us", val_col, "sel_rank"]
        )

    folded = ser.repartition(32, series_col).mapInPandas(
        lambda it: (kernel(pdf) for pdf in it),
        schema=(
            f"{series_col} long, {id_col} long, t_us long,"
            f" {val_col} double, sel_rank int"
        ),
    )
    return folded.select(
        series_col,
        id_col,
        F.timestamp_micros("t_us").alias(ts_col),
        val_col,
        "sel_rank",
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

    ser = (
        events.select(
            series_col,
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t_us"),
                F.col(id_col).alias("eid"),
                F.col(val_col).alias("v"),
            ).alias("p"),
        )
        .groupBy(series_col)
        .agg(F.sort_array(F.collect_list("p")).alias("seq"))
        .select(series_col, F.col("seq.v").alias("vals"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        for _, row in pdf.iterrows():
            y = np.asarray(row["vals"], dtype=np.float64)
            if len(y) < 2:
                continue
            s, b = y[0], y[1] - y[0]
            for x in y[1:]:
                s_prev = s
                s = alpha * x + (1 - alpha) * (s + b)
                b = beta * (s - s_prev) + (1 - beta) * b
            out.append((int(row[series_col]), len(y), s, b, s + b))
        return pd.DataFrame(
            out,
            columns=[series_col, "n_obs", "level", "trend", "forecast_next"],
        )

    return ser.repartition(32, series_col).mapInPandas(
        lambda it: (kernel(pdf) for pdf in it),
        schema=_holt_schema(series_col),
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
    recursion is order-sequential. Deliberately EXEMPT from the
    module's collapse rule: the series key is a bounded categorical
    (|event_type| ~ 5, each series period-bounded), so per-group
    ``applyInPandas`` pays a handful of Arrow crossings total, while
    the collapse's extra collect_list shuffle costs more than it
    saves (measured r9: 0.53 -> 0.90 s at sf0.1 for the collapsed
    form; reverted). Series shorter than two full seasons are
    dropped (no seasonal estimate).
    """

    def kernel_one(key: str, y: np.ndarray) -> tuple | None:
        m = period
        if len(y) < 2 * m:
            return None
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
        return (
            key,
            len(y),
            s,
            b,
            float(seas.max() - seas.min()),
            s + b + seas[len(y) % m],
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col).reset_index(drop=True)
        r = kernel_one(
            str(pdf[series_col].iloc[0]),
            pdf[val_col].to_numpy(dtype=np.float64),
        )
        cols = [
            series_col,
            "n_obs",
            "level",
            "trend",
            "season_amplitude",
            "forecast_next",
        ]
        return pd.DataFrame([r] if r is not None else [], columns=cols)

    return (
        hourly.select(series_col, idx_col, val_col)
        .groupBy(series_col)
        .applyInPandas(kernel, schema=_hw_schema(series_col))
    )
