"""Wave-63: classifier evaluation (PRF, kappa) + OOV coverage."""

from __future__ import annotations

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_confusion_prf_identities(spark):
    """Micro identities: sum(tp) = agreements, sum(n_true) = sum(n_pred)
    = corpus size; per-class metric bounds; f1 is the harmonic mean
    (checked against p/r where both nonzero)."""
    rows = all_specs()["q_eval_langid_confusion"].fn(spark, SF).collect()
    assert len(rows) == 5  # the five fixture languages
    assert sum(r.n_true for r in rows) == 500
    assert sum(r.n_pred for r in rows) == 500
    for r in rows:
        assert 0 <= r.tp <= min(r.n_true, r.n_pred)
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0
        if r.precision > 0 and r.recall > 0:
            hm = 2 * r.precision * r.recall / (r.precision + r.recall)
            assert abs(r.f1 - hm) < 1e-12


def test_kappa_matches_confusion_and_bounds(spark):
    (k,) = all_specs()["q_stats_cohens_kappa"].fn(spark, SF).collect()
    rows = all_specs()["q_eval_langid_confusion"].fn(spark, SF).collect()
    assert k.n_docs == 500
    assert k.agree == sum(r.tp for r in rows)
    assert abs(k.po - k.agree / k.n_docs) < 1e-12
    pe = sum(r.n_true * r.n_pred for r in rows) / (k.n_docs**2)
    assert abs(k.pe - pe) < 1e-12
    assert abs(k.kappa - (k.po - k.pe) / (1 - k.pe)) < 1e-12
    # the HONEST fixture read — and the reason kappa exists: on this
    # synthetic token corpus the stopword markers almost never fire,
    # the alphabetical tie-break dominates predictions, and agreement
    # is pure chance. Raw accuracy (po ~ 0.2) would look like signal;
    # kappa ~ 0 exposes it. Pin the chance-level read as a regression
    # gate on both the classifier and the metric.
    assert k.po > 0
    assert -0.1 < k.kappa < 0.1


def test_oov_rate_bounds_and_vocab_coverage(spark):
    """Every source has tokens; rates in [0,1]; the corpus-wide OOV
    mass equals total tokens minus occurrences of the top-256 vocab
    (recomputed independently in pandas)."""
    import collections

    import pandas as pd

    rows = all_specs()["q_text_oov_rate"].fn(spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.n_tokens > 0
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-12
    d = pd.read_parquet(f"{SF}/documents.parquet")
    counts = collections.Counter()
    total = 0
    for t in d.text:
        toks = t.split(" ")
        total += len(toks)
        counts.update(toks)
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    }
    in_vocab = sum(c for t, c in counts.items() if t in vocab)
    assert sum(r.n_tokens for r in rows) == total
    assert sum(r.n_oov for r in rows) == total - in_vocab
