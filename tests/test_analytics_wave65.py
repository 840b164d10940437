"""Wave-65: streaming conformal anomaly flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.plans import analytics_wave65 as w65
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_stream_flags_are_bit_equal_to_batch_scoring(spark):
    """Scoring is a pure function of (model, record), so the stream's
    output must equal batch scoring of the same fixture rows —
    including the abs_resid doubles, not just the flag bits."""
    out = all_specs()["s_stream_conformal_flags"].fn(spark, SF)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # lineitem, so compare sorted multisets of full rows
    key = lambda r: (  # noqa: E731
        r.l_orderkey,
        r.l_linenumber,
        r.abs_resid,
        r.q_hat,
        r.flagged,
    )
    got = sorted(key(r) for r in out.collect())
    slope, intercept, q_hat = w65.conformal_model(spark, SF)
    rows = w65.stream_fixture_rows(SF)
    assert len(got) == len(rows) == 200
    batch = spark.createDataFrame(rows).select(
        *w65._score_cols(slope, intercept, q_hat)
    )
    want = sorted(key(r) for r in batch.collect())
    assert got == want


def test_flag_rate_respects_the_conformal_budget(spark):
    """Flags on the held-out test slice fire near alpha = 0.1 — the
    known alert budget (slack for the 200-row slice)."""
    out = all_specs()["s_stream_conformal_flags"].fn(spark, SF)
    n = out.count()
    n_flagged = out.filter(F.col("flagged")).count()
    assert n == 200
    assert 0 < n_flagged < n
    assert n_flagged / n <= 0.1 + 0.07  # alpha + finite-sample slack
