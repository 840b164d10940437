"""Wave-34 semantics beyond the oracle hash: PACF vs statsmodels-style
numpy recompute."""

from __future__ import annotations
import pytest

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _dense_hourly(spark):
    e = load(spark, SF, "events").toPandas()
    hr = (e.ts.astype("int64") // 1_000_000_000 // 3600).values
    lo, hi = hr.min(), hr.max()
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    for h in hr:
        c[h - lo] += 1
    return c


@pytest.mark.slow
def test_pacf_matches_numpy_durbin_levinson(spark):
    res = all_specs()["q_events_pacf"].fn(spark, SF).toPandas().iloc[0]
    x = _dense_hourly(spark).astype(np.float64)
    n = len(x)
    xm = x.mean()
    g0 = ((x - xm) ** 2).sum()
    r = [((x[:-k] - xm) * (x[k:] - xm)).sum() / g0 for k in (1, 2, 3)]
    r1, r2, r3 = r
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    assert abs(res.r1 - r1) < 1e-8
    assert abs(res.r2 - r2) < 1e-8
    assert abs(res.r3 - r3) < 1e-8
    assert abs(res.pacf1 - r1) < 1e-8
    assert abs(res.pacf2 - phi22) < 1e-8
    assert abs(res.pacf3 - pacf3) < 1e-8


def test_pacf_magnitudes_bounded(spark):
    res = all_specs()["q_events_pacf"].fn(spark, SF).toPandas().iloc[0]
    for c in ("r1", "r2", "r3", "pacf1", "pacf2", "pacf3"):
        assert abs(res[c]) <= 1.0 + 1e-9, c
