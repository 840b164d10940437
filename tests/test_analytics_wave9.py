"""Wave-9 semantics beyond the oracle hash.

The oracle gate proves Spark == DuckDB; these tests pin properties the
shared formulation itself must satisfy (a bug present in BOTH engines
would hash-match, so invariants need their own checks).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_suffix_dup_spans_invariants(spark):
    """Spans are interval unions of K-grams: coverage per doc must be
    >= K, <= n_tokens, and >= n_spans * K - overlaps (each span covers
    at least K tokens)."""
    from weather_flink_spark.plans.analytics_wave9 import _SPAN_K

    df = all_specs()["q_text_suffix_dup_spans"].fn(spark, SF)
    rows = df.collect()
    assert rows, "dup spans must exist in the near-dup-bearing corpus"
    for r in rows:
        assert r.dup_tokens >= _SPAN_K
        assert r.dup_tokens <= r.n_tokens
        assert r.dup_tokens >= r.n_dup_spans * _SPAN_K - 0  # each span >= K wide
        assert abs(r.dup_frac - r.dup_tokens / r.n_tokens) < 1e-12


def test_suffix_dup_spans_catches_planted_duplicate(spark):
    """A doc sharing a >= K+2-token run with another doc must be
    reported by both doc ids."""
    from weather_flink_spark.plans.analytics_wave9 import q_text_suffix_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j unique tail one"),
            (2, "prefix two a b c d e f g h i j other"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "wfs_wave9_planted")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in q_text_suffix_dup_spans(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1].dup_tokens == 10 and out[2].dup_tokens == 10
    assert out[1].n_dup_spans == 1


def test_ttr_window_bounds(spark):
    """Windowed and raw TTR are ratios in (0, 1]; mean_ttr >= raw_ttr
    is typical but not guaranteed — only the bounds are invariant."""
    df = all_specs()["q_text_ttr_window"].fn(spark, SF)
    bad = df.where(
        (F.col("mean_ttr") <= 0)
        | (F.col("mean_ttr") > 1)
        | (F.col("raw_ttr") <= 0)
        | (F.col("raw_ttr") > 1)
    ).count()
    assert bad == 0
    assert df.count() > 0


def test_domain_mix_shares_normalize(spark):
    """Both share columns must sum to 1; tempering must compress the
    spread (min weight < 1 < max weight unless already uniform)."""
    rows = all_specs()["q_text_domain_mix"].fn(spark, SF).collect()
    assert abs(sum(r.cur_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-9
    # alpha=0.5 tempering moves every weight toward 1 from the share ratio
    for r in rows:
        ratio = r.target_share / r.cur_share
        assert abs(r.weight - round(ratio, 6)) < 1e-9
        # tempered weight is sqrt-flattening: w = sqrt(u)/E[sqrt(u)]-ish,
        # so sources above the mean share get weight < the inverse ratio
        assert r.weight > 0


def test_horvitz_thompson_unbiased_over_seeds(spark):
    """HT is design-unbiased: the estimate equals truth exactly for
    certainly-included docs (pi=1) and is within a loose band overall
    (the estimator must not be systematically scaled)."""
    rows = all_specs()["q_sample_horvitz_thompson"].fn(spark, SF).collect()
    tot_true = sum(r.true_tokens for r in rows)
    tot_ht = sum(r.ht_tokens for r in rows)
    assert rows
    # 500-doc corpus, mixed pis: the pooled HT estimate should land
    # within 25% of truth for any fixed seed (it does for this one;
    # the bound is the regression tripwire, not a statistical claim)
    assert abs(tot_ht - tot_true) / tot_true < 0.25


def test_permutation_test_pvalue_range(spark):
    r = all_specs()["q_stats_permutation_test"].fn(spark, SF).collect()
    assert len(r) == 1
    row = r[0]
    assert 0.0 < row.p_value <= 1.0
    assert row.n_ge <= row.n_reps
    assert row.p_value == (1.0 + row.n_ge) / (1.0 + row.n_reps)


def test_bh_step_up_shape(spark):
    """BH rejections must be a prefix of the p-ascending ranks within
    each family, and the A&S p must agree with math.erfc to 1e-5."""
    rows = all_specs()["q_stats_benjamini_hochberg"].fn(spark, SF).collect()
    by_family: dict[str, list] = {}
    for r in rows:
        by_family.setdefault(r.event_type, []).append(r)
    for fam, rs in by_family.items():
        rs.sort(key=lambda r: r.p_rank)
        flags = [r.rejected for r in rs]
        # prefix property: once False, never True again
        assert flags == sorted(flags, reverse=True), f"non-prefix rejections in {fam}"
    for r in rows:
        exact = math.erfc(abs(r.z) / math.sqrt(2.0))
        assert abs(r.p - exact) < 1e-5, (r.z, r.p, exact)


def test_rate_limit_bounds_any_key(spark):
    """No (user, hour) key may contribute more than M events."""
    from weather_flink_spark.io import load
    from weather_flink_spark.plans.analytics_wave9 import _RATE_M

    e = load(spark, SF, "events")
    w_counts = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    kept = all_specs()["q_events_rate_limit"].fn(spark, SF)
    n_kept = kept.agg(F.sum("n_kept")).collect()[0][0]
    n_keys = e.select("user_id", F.date_trunc("hour", "ts")).distinct().count()
    assert n_kept <= n_keys * _RATE_M
    if w_counts > _RATE_M:
        assert n_kept < e.count()  # something was actually throttled


def test_item_jaccard_bounds(spark):
    rows = all_specs()["q_graph_item_jaccard"].fn(spark, SF).collect()
    assert rows
    for r in rows[:500]:
        assert 0.0 < r.jaccard <= 1.0
        assert r.co <= min(r.deg_a, r.deg_b)


def test_contrastive_negatives_exclude_near_dups(spark):
    from weather_flink_spark.plans.analytics_wave9 import _NEG_DUP_COS, _NEG_K

    rows = all_specs()["q_sim_contrastive_negatives"].fn(spark, SF).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.cosine < _NEG_DUP_COS
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= _NEG_K
        ranks = sorted(r.neg_rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
