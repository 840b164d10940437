"""Wave-31 semantics beyond the oracle hash: DAU/WAU exactness vs
pandas, OLS vs numpy lstsq."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_dau_wau_matches_pandas(spark):
    res = (
        all_specs()["q_events_dau_wau"]
        .fn(spark, SF)
        .toPandas()
        .set_index("day")
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    e["d"] = e.ts.dt.date
    act = e[["d", "user_id"]].drop_duplicates()
    for day, g in act.groupby("d"):
        assert res.loc[day].dau == g.user_id.nunique()
        import datetime

        lo = day - datetime.timedelta(days=6)
        win = act[(act.d >= lo) & (act.d <= day)]
        assert res.loc[day].wau == win.user_id.nunique()
    assert (res.wau >= res.dau).all()
    assert ((res.stickiness > 0) & (res.stickiness <= 1.0)).all()


def test_ols_multi_matches_numpy_lstsq(spark):
    res = (
        all_specs()["q_stats_ols_multi"]
        .fn(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    t_us = e.ts.astype("int64") // 1000
    e["x1"] = (t_us // 3_600_000_000) % 24
    e["x2"] = (((t_us // 86_400_000_000) + 4) % 7).isin([0, 6]).astype(int)
    for t, g in e.groupby("event_type"):
        X = np.column_stack(
            [np.ones(len(g)), g.x1.values.astype(float), g.x2.values.astype(float)]
        )
        beta, *_ = np.linalg.lstsq(X, g.value.values, rcond=None)
        row = res.loc[t]
        assert row.n == len(g)
        got = np.array([row.intercept, row.beta_hod, row.beta_weekend])
        assert np.abs(got - beta).max() < 1e-6, (t, got, beta)


def test_t_closeness_matches_numpy_emd(spark):
    """Recompute the 1-D EMD per QI group with numpy cumulative sums
    and assert agreement (the engine's all-integer numerators must
    equal the float recompute to rounding tolerance)."""
    res = (
        all_specs()["q_privacy_t_closeness"]
        .fn(spark, SF)
        .toPandas()
        .set_index(["c_nationkey", "c_mktsegment"])
        .sort_index()
    )
    c = load(spark, SF, "customer").toPandas()
    c["band"] = np.floor(c.c_acctbal / 1000.0).astype(int)
    bands = np.sort(c.band.unique())
    n = len(c)
    p = np.array([(c.band == b).sum() / n for b in bands])
    for (nk, seg), g in c.groupby(["c_nationkey", "c_mktsegment"]):
        q = np.array([(g.band == b).sum() / len(g) for b in bands])
        emd = float(np.abs(np.cumsum(q - p)).sum())
        row = res.loc[(nk, seg)]
        assert row.group_size == len(g)
        assert abs(row.t_emd - emd) < 1e-8, (nk, seg)
        assert row.t_ok == (emd <= 0.2 + 1e-12)
