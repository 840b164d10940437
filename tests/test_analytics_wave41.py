"""Wave-41 semantics beyond the oracle hash: Gini vs numpy and its
invariances."""

from __future__ import annotations

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _gini_np(x: np.ndarray) -> float:
    x = np.sort(x)
    n = len(x)
    i = np.arange(1, n + 1)
    return float(((2 * i - n - 1) * x).sum() / (n * x.sum()))


def test_gini_matches_numpy(spark):
    res = all_specs()["q_orders_gini"].fn(spark, SF).toPandas().iloc[0]
    o = load(spark, SF, "orders").toPandas()
    rev = o.groupby("o_custkey").o_totalprice.sum()
    cents = np.round(rev.values * 100).astype(np.int64)
    assert res.n_customers == len(cents)
    assert res.total_cents == cents.sum()
    assert abs(res.gini - _gini_np(cents.astype(float))) < 1e-7


def test_gini_bounds_and_known_cases():
    # equal incomes -> 0; one-has-all -> (n-1)/n
    eq = np.full(100, 7.0)
    assert abs(_gini_np(eq)) < 1e-12
    solo = np.zeros(100)
    solo[0] = 5.0
    assert abs(_gini_np(solo) - 99 / 100) < 1e-12


def test_gini_in_unit_interval(spark):
    res = all_specs()["q_orders_gini"].fn(spark, SF).toPandas().iloc[0]
    assert 0.0 <= res.gini < 1.0
