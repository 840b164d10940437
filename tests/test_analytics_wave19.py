"""Wave-19 semantics beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_msprt_checkpoints_accumulate(spark):
    rows = sorted(
        all_specs()["q_stats_msprt"].fn(spark, SF).collect(),
        key=lambda r: r.checkpoint_day,
    )
    assert len(rows) >= 5
    for a, b in zip(rows, rows[1:]):
        # enrollment is cumulative: counts never shrink
        assert b.n_a >= a.n_a and b.n_b >= a.n_b
        assert b.c_a >= a.c_a and b.c_b >= a.c_b
    for r in rows:
        assert r.__getattr__("lambda") >= 0.0
        assert 0.0 < r.p_always_valid <= 1.0
        assert r.can_stop == (r.p_always_valid < 0.05)
    # final checkpoint covers every user
    users = load(spark, SF, "events").select("user_id").distinct().count()
    assert rows[-1].n_a + rows[-1].n_b == users


def test_msprt_lambda_formula(spark):
    """Re-derive lambda from the reported counts at the last checkpoint."""
    import math

    r = sorted(
        all_specs()["q_stats_msprt"].fn(spark, SF).collect(),
        key=lambda x: x.checkpoint_day,
    )[-1]
    ra, rb = r.c_a / r.n_a, r.c_b / r.n_b
    v = ra * (1 - ra) / r.n_a + rb * (1 - rb) / r.n_b
    tau2 = 0.0001
    delta = rb - ra
    lam = math.sqrt(v / (v + tau2)) * math.exp(
        tau2 * delta * delta / (2.0 * v * (v + tau2))
    )
    assert abs(r.__getattr__("lambda") - round(lam, 6)) < 2e-6


def test_elasticity_is_negative_demand_curve(spark):
    """Unit price in TPC-H-ish data is extendedprice/qty, so ln(qty)
    regressed on ln(price) has a mechanically negative slope — the
    sanity direction a demand curve must show; r2-free sanity only."""
    rows = all_specs()["q_orders_price_elasticity"].fn(spark, SF).collect()
    assert rows
    n_brands = load(spark, SF, "part").select("p_brand").distinct().count()
    assert len(rows) == n_brands
    neg = sum(1 for r in rows if r.elasticity < 0)
    assert neg >= len(rows) * 0.8  # overwhelmingly negative slopes
    for r in rows:
        assert r.n > 10
