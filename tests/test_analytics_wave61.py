"""Wave-61: split conformal prediction intervals."""

from __future__ import annotations

import pandas as pd

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_conformal_coverage_guarantee_and_bookkeeping(spark):
    """The split conformal promise: test coverage concentrates at
    >= 1 - alpha (slack for finite-sample fluctuation on a ~1.2k test
    split); splits partition the table; q_hat is a real calibration
    residual (positive, finite)."""
    (r,) = all_specs()["q_stats_conformal_interval"].fn(spark, SF).collect()
    n_total = len(pd.read_parquet(f"{SF}/lineitem.parquet"))
    assert r.n_train + r.n_cal + r.n_test == n_total
    assert r.alpha == 0.1
    assert r.q_hat > 0
    assert 0 <= r.n_covered <= r.n_test
    assert r.coverage >= 1 - r.alpha - 0.03
    assert abs(r.coverage - r.n_covered / r.n_test) < 1e-12


def test_conformal_qhat_is_the_exact_order_statistic(spark):
    """Replay the calibration quantile independently in pandas: the
    engine's q_hat must equal the ceil((n_cal+1)*0.9)-th smallest
    absolute calibration residual computed from the same rounded
    coefficients and the same md5 split."""
    import hashlib
    import math

    (r,) = all_specs()["q_stats_conformal_interval"].fn(spark, SF).collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")

    def bucket(row):
        h = hashlib.md5(
            f"conf:{row.l_orderkey}:{row.l_linenumber}".encode()
        ).hexdigest()
        return int(h[:7], 16) % 100

    b = li.apply(bucket, axis=1)
    cal = li[(b >= 60) & (b < 80)]
    ar = (
        cal.l_extendedprice.astype(float)
        - (r.intercept + r.slope * cal.l_quantity.astype(float))
    ).abs()
    assert len(cal) == r.n_cal
    rank = math.ceil((r.n_cal + 1) * 0.9)
    q = sorted(ar)[rank - 1]
    assert abs(round(q, 6) - r.q_hat) < 1e-9
