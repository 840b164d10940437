"""Wave-7 semantics beyond the oracle hash (LTV, bootstrap, ensemble)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_monotone_and_consistent(spark):
    rows = all_specs()["q_orders_cohort_ltv"].fn(spark, SF).collect()
    o = load(spark, SF, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        cums = [r["cum_revenue"] for r in rs]
        assert cums == sorted(cums), f"cum_revenue not monotone for {cohort}"
        assert abs(cums[-1] - sum(r["revenue"] for r in rs)) < 1e-6
        for r in rs:
            assert abs(r["ltv_per_customer"] - r["cum_revenue"] / r["cohort_size"]) < 1e-9


def test_bootstrap_statistics_sane(spark):
    rows = all_specs()["q_stats_bootstrap_ci"].fn(spark, SF).collect()
    assert len(rows) == 40
    o = load(spark, SF, "orders")
    n = o.count()
    true_mean = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double") / F.count("*"))
    ).collect()[0][0]
    means = [r["resample_mean"] for r in rows]
    for r in rows:
        # Poisson(1) weights: n_eff concentrates around n (±5 sd ≈ 5√n)
        assert abs(r["n_eff"] - n) < 5 * n**0.5 + 10
    # the bootstrap distribution must bracket the true mean
    assert min(means) < true_mean < max(means)
    grand = sum(means) / len(means)
    assert abs(grand - true_mean) / true_mean < 0.05


def test_keywords_rank_bounds(spark):
    rows = all_specs()["q_text_keywords_topk"].fn(spark, SF).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in per_doc.items():
        ranks = sorted(r["rk"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        rs.sort(key=lambda r: r["rk"])
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_ensemble_verdict_matches_flags(spark):
    rows = all_specs()["q_quality_ensemble"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        dup = r["dup_trigram_frac"] or 0.0
        expect_keep = bool(
            r["gopher_pass"] and dup <= 0.01 and r["avg_nll"] <= 3.40
        )
        assert r["keep"] == expect_keep
        assert (r["verdict"] == "kept") == expect_keep
