"""Wave-29 semantics beyond the oracle hash: coreset geometry and the
streamed-vs-batch Kalman state equality."""

from __future__ import annotations
import pytest

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans import analytics_wave29 as w29
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# k-center coreset
# ---------------------------------------------------------------------------


def _scaled_points(spark):
    emb = (
        load(spark, SF, "embeddings").toPandas().set_index("vec_id").sort_index()
    )
    x = np.array(
        [np.round(np.asarray(v, dtype=np.float64), 6) for v in emb.embedding]
    )
    return emb.index.to_numpy(), np.rint(x * 1e6).astype(np.int64)


def test_kcenter_matches_numpy_greedy(spark):
    """The registered plan must equal the straightforward integer
    greedy: seed = min id, then repeatedly the farthest point."""
    res = (
        all_specs()["q_sample_kcenter_coreset"]
        .fn(spark, SF)
        .toPandas()
        .sort_values("sel_order")
        .reset_index(drop=True)
    )
    ids, n = _scaled_points(spark)
    order = np.argsort(ids)
    ids, n = ids[order], n[order]
    chosen = [0]  # min vec_id
    md = ((n - n[chosen[0]]) ** 2).sum(axis=1)
    expected = [(0, int(ids[0]), 0)]
    for r in range(1, w29._KC_K):
        best = np.lexsort((ids, -md))[0]
        expected.append((r, int(ids[best]), int(md[best])))
        if r < w29._KC_K - 1:
            d = ((n - n[best]) ** 2).sum(axis=1)
            md = np.minimum(md, d)
    got = list(
        zip(res.sel_order.astype(int), res.vec_id.astype(int), res.max_min_d2.astype(int))
    )
    assert got == expected


def test_kcenter_selection_distances_decrease(spark):
    """Greedy max-min distances are non-increasing over rounds (each
    selection can only shrink every point's min distance)."""
    res = (
        all_specs()["q_sample_kcenter_coreset"]
        .fn(spark, SF)
        .toPandas()
        .sort_values("sel_order")
    )
    d = res.max_min_d2.values[1:]  # skip the seed's 0
    assert (np.diff(d) <= 0).all()
    assert res.vec_id.nunique() == w29._KC_K


# ---------------------------------------------------------------------------
# streaming Kalman
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_stream_kalman_final_state_equals_batch_fold(spark):
    """The LAST emitted state per user must equal a batch fold of the
    same fixture events bit-for-bit (same op order, time-ordered
    batches)."""
    from weather_flink_spark.plans.analytics_wave28 import _KAL_Q, _KAL_R

    streamed = (
        all_specs()["s_stream_kalman_filter"].fn(spark, SF).toPandas()
    )
    # two micro-batches -> two emissions per user; last = max n_obs
    last = (
        streamed.sort_values(["user_id", "n_obs"])
        .groupby("user_id")
        .tail(1)
        .set_index("user_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    users = sorted(e.user_id.unique())[:8]
    fix = (
        e[e.user_id.isin(users)]
        .sort_values(["ts", "event_id"])
        .head(200)
    )
    for uid, g in fix.groupby("user_id"):
        y = g.sort_values(["ts", "event_id"]).value.to_numpy(dtype="float64")
        l, p, n = 0.0, 1.0, 0
        for x in y:
            if n == 0:
                l = float(x)
            else:
                pp = p + _KAL_Q
                k = pp / (pp + _KAL_R)
                l = l + k * (float(x) - l)
                p = (1.0 - k) * pp
            n += 1
        row = last.loc[uid]
        assert row.n_obs == n, uid
        assert row.level == l, uid  # bit-exact
        assert row.p_var == p, uid


def test_stream_kalman_state_carries_across_batches(spark):
    """Each user must emit one row per micro-batch with growing n_obs —
    proof the state store carried, not restarted."""
    streamed = (
        all_specs()["s_stream_kalman_filter"].fn(spark, SF).toPandas()
    )
    per_user = streamed.groupby("user_id").n_obs.agg(["count", "min", "max"])
    assert (per_user["count"] == 2).all()
    assert (per_user["min"] < per_user["max"]).all()
