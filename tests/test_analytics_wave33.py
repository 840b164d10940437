"""Wave-33 semantics beyond the oracle hash: KM vs a lifelines-style
recompute, TOST vs scipy-free normal math."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave33 import (
    _TOST_A,
    _TOST_B,
    _TOST_MARGIN,
)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _km_reference(spark):
    e = load(spark, SF, "events").toPandas()
    rows = []
    for uid, g in e.groupby("user_id"):
        first = g.ts.min()
        purch = g[g.event_type == "purchase"].ts.min()
        if purch is not None and purch == purch:  # not NaT
            rows.append(((purch.date() - first.date()).days, 1))
        else:
            rows.append(((g.ts.max().date() - first.date()).days, 0))
    return rows


def test_kaplan_meier_matches_python_product_limit(spark):
    res = (
        all_specs()["q_stats_kaplan_meier"]
        .fn(spark, SF)
        .toPandas()
        .set_index("duration_days")
        .sort_index()
    )
    rows = _km_reference(spark)
    durs = sorted({d for d, _ in rows})
    s = 1.0
    zero = False
    for d in durs:
        n_risk = sum(1 for dd, _ in rows if dd >= d)
        deaths = sum(1 for dd, dth in rows if dd == d and dth == 1)
        row = res.loc[d]
        assert row.n_risk == n_risk
        assert row.n_death == deaths
        if deaths > 0 and deaths == n_risk:
            zero = True
        elif deaths > 0:
            s *= 1.0 - deaths / n_risk
        assert row.survival_zero == zero, d
        if not zero:
            assert abs(row.ln_survival - math.log(s)) < 1e-6, d


def test_km_below_na_exp_bound(spark):
    """S_KM(t) <= exp(-H_NA(t)) pointwise (1-x <= e^-x per factor) —
    the two estimators must bracket consistently."""
    km = (
        all_specs()["q_stats_kaplan_meier"]
        .fn(spark, SF)
        .toPandas()
        .set_index("duration_days")
        .sort_index()
    )
    na = (
        all_specs()["q_stats_survival_hazard"]
        .fn(spark, SF)
        .toPandas()
        .set_index("duration_days")
        .sort_index()
    )
    both = km.join(na, lsuffix="_km", rsuffix="_na")
    ok = both[~both.survival_zero]
    assert len(ok) > 0
    assert (ok.ln_survival <= -ok.cum_hazard + 1e-9).all()


def test_tost_matches_scipy_free_reference(spark):
    res = all_specs()["q_stats_tost_equivalence"].fn(spark, SF).toPandas().iloc[0]
    e = load(spark, SF, "events").toPandas()
    a = e[e.event_type == _TOST_A].value.values
    b = e[e.event_type == _TOST_B].value.values
    diff = a.mean() - b.mean()
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    z_lo = (diff + _TOST_MARGIN) / se
    z_up = (_TOST_MARGIN - diff) / se

    def p1(z):
        # 1 - Phi(z), A&S 26.2.17
        x = abs(z)
        t = 1.0 / (1.0 + 0.2316419 * x)
        pdf = 0.3989422804014327 * math.exp(-0.5 * x * x)
        tail = pdf * t * (
            0.319381530
            + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
        )
        return tail if z >= 0 else 1.0 - tail

    assert res.na == len(a) and res.nb == len(b)
    assert abs(res["diff"] - diff) < 1e-4
    assert abs(res.se - se) < 1e-4
    assert abs(res.p_lower - p1(z_lo)) < 1e-4
    assert abs(res.p_upper - p1(z_up)) < 1e-4
    assert res.p_tost == max(res.p_lower, res.p_upper)
    assert res.equivalent == (res.p_tost < 0.05)
