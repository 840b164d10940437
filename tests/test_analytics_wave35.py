"""Wave-35 semantics beyond the oracle hash: DiD vs pandas cell math,
winsorization vs numpy clip."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave35 import _DID_SPLIT, _WZ_HI, _WZ_LO
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_did_matches_pandas_cells(spark):
    res = all_specs()["q_stats_did"].fn(spark, SF).toPandas().iloc[0]
    e = load(spark, SF, "events").toPandas()
    e["treated"] = e.user_id.map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
    )
    e["post"] = (e.ts >= pd.Timestamp(_DID_SPLIT)).astype(int)
    m = {}
    v = {}
    for (t, p), g in e.groupby(["treated", "post"]):
        assert res[f"n{t}{p}"] == len(g)
        m[(t, p)] = g.value.mean()
        v[(t, p)] = g.value.var(ddof=1)
        assert abs(res[f"m{t}{p}"] - m[(t, p)]) < 1e-4
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se = math.sqrt(
        sum(v[(t, p)] / res[f"n{t}{p}"] for t in (0, 1) for p in (0, 1))
    )
    assert abs(res.did - did) < 1e-4
    assert abs(res.se - se) < 1e-4
    assert res.significant == (abs(res.z) > 1.96)


def test_winsorize_matches_numpy(spark):
    res = (
        all_specs()["q_quality_winsorize"]
        .fn(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    for t, g in e.groupby("event_type"):
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(g)
        lo = g.value.iloc[math.ceil(n * _WZ_LO / 100.0) - 1]
        hi = g.value.iloc[math.ceil(n * _WZ_HI / 100.0) - 1]
        row = res.loc[t]
        assert row.n == n
        assert row[f"p{_WZ_LO}_lo"] == lo
        assert row[f"p{_WZ_HI}_hi"] == hi
        assert row.n_clipped_low == (g.value < lo).sum()
        assert row.n_clipped_high == (g.value > hi).sum()
        clipped = np.clip(g.value.values, lo, hi)
        assert abs(row.mean_raw - g.value.mean()) < 1e-4
        assert abs(row.mean_winsor - clipped.mean()) < 1e-4
        # winsorized mean must not move past the raw mean's tails
        assert row[f"p{_WZ_LO}_lo"] <= row.mean_winsor <= row[f"p{_WZ_HI}_hi"]
