"""Wave-13 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_match_pattern_is_a_strict_v(spark):
    rows = all_specs()["q_events_match_pattern"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.drop_depth > 0  # was falling into the bottom
        assert r.rebound > 0  # and rebounded


def test_pq_codebook_members_reconstruct_exactly(spark):
    """Codebook vectors are their own nearest codewords: zero error."""
    from weather_flink_spark.plans.analytics_wave13 import _PQ_KC, _PQ_M

    rows = all_specs()["q_emb_pq_quantize"].fn(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.recon_err >= 0.0
        if r.vec_id < _PQ_KC:
            assert r.recon_err == 0.0
            assert all(getattr(r, f"code_{m}") == r.vec_id for m in range(_PQ_M))


@pytest.mark.slow
def test_markov_removal_invariants(spark):
    rows = all_specs()["q_attr_markov_removal"].fn(spark, SF).collect()
    assert len(rows) == 4
    tot_attr = sum(r.attribution for r in rows)
    assert abs(tot_attr - 1.0) < 1e-4  # shares normalize (6dp rounding slack)
    for r in rows:
        # removing a channel can only lose conversions
        assert r.conv_removed <= r.conv_full
        assert 0.0 <= r.removal_effect <= 1.0
        assert r.n_touches > 0
        assert 0.0 < r.conv_full <= 1.0
