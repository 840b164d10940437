"""Wave-67: Misra-Gries heavy-hitters summary."""

from __future__ import annotations

import collections

import pandas as pd

from weather_flink_spark.plans.analytics_wave67 import _MG_K
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_mg_guarantees_hold(spark):
    """The full Misra-Gries contract against exact pandas counts:
    est <= true <= est + T, T <= n/(k+1), <= k survivors, and EVERY
    item with true count > n/(k+1) is present."""
    rows = all_specs()["q_agg_heavy_hitters_mg"].fn(spark, SF).collect()
    e = pd.read_parquet(f"{SF}/events.parquet")
    true = collections.Counter(zip(e.user_id, e.event_type))
    n = len(e)
    assert 0 < len(rows) <= _MG_K
    thr = rows[0].threshold
    assert all(r.threshold == thr for r in rows)
    assert thr <= n / (_MG_K + 1)
    got = {(r.user_id, r.event_type): r for r in rows}
    for key, r in got.items():
        assert r.exact_count == true[key]
        assert r.est_count == r.exact_count - thr
        assert 0 < r.est_count <= r.exact_count <= r.est_count + thr
    for key, cnt in true.items():
        if cnt > n / (_MG_K + 1):
            assert key in got, (key, cnt)


def test_mg_threshold_is_kplus1th_largest(spark):
    rows = all_specs()["q_agg_heavy_hitters_mg"].fn(spark, SF).collect()
    e = pd.read_parquet(f"{SF}/events.parquet")
    true = collections.Counter(zip(e.user_id, e.event_type))
    counts = sorted(true.values(), reverse=True)
    want = counts[_MG_K] if len(counts) > _MG_K else 0
    assert rows[0].threshold == want
