"""Wave-28 semantics beyond the oracle hash: whitening variance,
Kalman convergence, collision balance, streamed-vs-batch DSIR
bit-equality."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans import analytics_wave28 as w28
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# whitening
# ---------------------------------------------------------------------------


def test_whitening_produces_near_unit_variance(spark):
    """Whitened coordinates must have sample variance ~1 per component
    (that is the definition: var(pc_c) = lambda_c under the (n-1)
    covariance convention)."""
    res = all_specs()["q_emb_whitening"].fn(spark, SF).toPandas()
    for c in range(w28._WH_K):
        v = res[f"w{c + 1}"].values
        var = v.var(ddof=1)
        assert 0.9 < var < 1.1, (c, var)


def test_whitening_decorrelates(spark):
    """Cross-component correlations of the whitened coordinates must be
    near zero (components are orthogonal eigendirections)."""
    res = all_specs()["q_emb_whitening"].fn(spark, SF).toPandas()
    w = res[[f"w{c + 1}" for c in range(w28._WH_K)]].values
    corr = np.corrcoef(w.T)
    off = corr[~np.eye(w28._WH_K, dtype=bool)]
    assert np.abs(off).max() < 0.1


def test_whitening_is_scaled_projection(spark):
    """w_c must equal pc_c / sqrt(lambda_c) of the registered PCA
    projection to rounding tolerance (shared model, shared fold)."""
    from weather_flink_spark.plans.llm_wave5 import pca_power_model

    model = pca_power_model(spark, SF)
    pcs = (
        all_specs()["q_emb_pca_project"]
        .fn(spark, SF)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    ws = (
        all_specs()["q_emb_whitening"]
        .fn(spark, SF)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    for c in range(w28._WH_K):
        exp = pcs[f"pc{c + 1}"].values / np.sqrt(model["lambdas"][c])
        assert np.abs(ws[f"w{c + 1}"].values - exp).max() < 2e-6


# ---------------------------------------------------------------------------
# Kalman filter
# ---------------------------------------------------------------------------


def test_kalman_matches_numpy_reference(spark):
    res = (
        all_specs()["q_events_kalman_filter"]
        .fn(spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    for uid, g in e.groupby("user_id"):
        y = g.sort_values(["ts", "event_id"]).value.to_numpy(dtype="float64")
        if len(y) < 2:
            assert uid not in res.index
            continue
        l, p = float(y[0]), 1.0
        for x in y[1:]:
            pp = p + w28._KAL_Q
            k = pp / (pp + w28._KAL_R)
            l = l + k * (float(x) - l)
            p = (1.0 - k) * pp
        row = res.loc[uid]
        assert row.n_obs == len(y)
        assert row.level == l  # bit-exact: same op order
        assert row.p_var == p
        assert row.pred_var == (p + w28._KAL_Q) + w28._KAL_R


def test_kalman_variance_converges_to_fixed_point(spark):
    """The posterior variance of a constant-coefficient local-level
    filter converges to the Riccati fixed point p* with
    p* = (1 - p*+Q/(p*+Q+R)) (p*+Q); all long-enough series must sit
    at the same value."""
    res = all_specs()["q_events_kalman_filter"].fn(spark, SF).toPandas()
    q, r = w28._KAL_Q, w28._KAL_R
    # solve p = (1-k)(p+q), k = (p+q)/(p+q+r)  =>  p^2 + q p - q r = 0
    p_star = (-q + np.sqrt(q * q + 4 * q * r)) / 2
    long_series = res[res.n_obs >= 20]
    assert len(long_series) > 0
    assert np.abs(long_series.p_var - p_star).max() < 1e-6


# ---------------------------------------------------------------------------
# hash collisions
# ---------------------------------------------------------------------------


def test_hash_collisions_cover_all_grams(spark):
    from weather_flink_spark.plans.analytics_wave27 import dsir_grams

    res = all_specs()["q_text_hash_collisions"].fn(spark, SF).toPandas()
    grams = dsir_grams(load(spark, SF, "documents"))
    assert res.n_occurrences.sum() == grams.count()
    assert res.n_distinct_grams.sum() == grams.select("g").distinct().count()
    # load ratios average 1 by construction
    assert abs(res.load_ratio.mean() - 1.0) < 0.01
    # md5 should be roughly uniform on this corpus
    assert res.load_ratio.max() < 2.0


# ---------------------------------------------------------------------------
# streaming DSIR scorer
# ---------------------------------------------------------------------------


def test_stream_dsir_equals_batch_bit_for_bit(spark):
    """The streamed scaled-integer scores must EQUAL the batch decimal
    sums exactly (scaled-int folds are associative — arrival order
    cannot diverge from batch grouping order)."""
    from weather_flink_spark.plans.analytics_wave27 import (
        dsir_grams,
        dsir_lr_table,
    )

    streamed = (
        all_specs()["s_stream_dsir_scores"]
        .fn(spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(streamed) == 20
    grams = dsir_grams(load(spark, SF, "documents")).where(
        F.col("doc_id") < 20
    )
    batch = (
        grams.join(F.broadcast(dsir_lr_table(spark, SF)), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum("lr9").alias("logw"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (streamed.n_grams == batch.n_grams).all()
    exp = batch.logw.map(lambda d: int(d.scaleb(9)))
    assert (streamed.logw_scaled == exp).all()


def test_dsir_scaled_array_is_the_lr_table(spark):
    from weather_flink_spark.plans.analytics_wave27 import (
        _DSIR_B,
        dsir_lr_table,
    )

    arr = w28.dsir_lr_scaled_array(spark, SF)
    assert len(arr) == _DSIR_B
    rows = {int(r.bucket): int(r.lr9.scaleb(9)) for r in dsir_lr_table(spark, SF).collect()}
    for b in range(_DSIR_B):
        assert arr[b] == rows.get(b, 0)
