"""Wave-77: 8-bit PQ codes + refine (the FAISS-default width)."""

from __future__ import annotations
import pytest

from weather_flink_spark.plans import analytics_wave56 as w56
from weather_flink_spark.plans import analytics_wave77 as w77
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_pq8_codes_table_shape_and_self_coding(spark):
    """Code table sanity: one row per vector, codes in [0, 256); a
    codebook-resident vector's subvectors are distance-0 from their
    own codeword, so (absent exact duplicates) it codes to itself —
    the property that makes the fixture's inflated ADC recall
    explainable rather than mysterious."""
    rows = w77.pq8_codes_table(spark, SF).collect()
    n = len(rows)
    assert n == 500
    self_coded = 0
    for r in rows:
        for m in range(4):
            c = getattr(r, f"code_{m}")
            assert 0 <= c < w77.PQ8_KC
        if r.vec_id < w77.PQ8_KC and all(
            getattr(r, f"code_{m}") == r.vec_id for m in range(4)
        ):
            self_coded += 1
    # allow a handful of exact-duplicate-subvector ties
    assert self_coded >= w77.PQ8_KC - 5, self_coded


@pytest.mark.slow
def test_pq8_panel_floors_and_orderings(spark):
    """Fixture floors one notch under the measured values (pq8_adc
    0.240, pq8_refined 0.936) and the orderings that carry the story:
    wider codes beat narrower at the same scan (pq8_adc > pq_adc), the
    refine stage dominates code width (pq8_refined > pq8_adc by a wide
    margin), and 8-bit + refine beats every 4-bit tier."""
    rows = {
        r.tier: r
        for r in all_specs()["q_sim_recall_panel_pq8"].fn(spark, SF).collect()
    }
    assert set(rows) == {"pq8_adc", "pq8_refined", "ivfpq8_refined"}
    for r in rows.values():
        assert r.n_queries == w56.N_PANEL
        assert abs(r.recall_at_5 - r.n_hits / (w56.N_PANEL * w56.PANEL_K)) < 1e-12
    assert rows["pq8_adc"].recall_at_5 >= 0.20
    assert rows["pq8_refined"].recall_at_5 >= 0.88
    pq4 = {
        r.tier: r.recall_at_5
        for r in all_specs()["q_sim_recall_panel_pq"].fn(spark, SF).collect()
    }
    assert rows["pq8_adc"].recall_at_5 > pq4["pq_adc"]
    assert rows["pq8_refined"].recall_at_5 > rows["pq8_adc"].recall_at_5 + 0.3
    assert rows["pq8_refined"].recall_at_5 > max(pq4.values())
    # the FAISS-default composition (IVF + PQ8 + refine, fixture 0.544
    # / sf0.1 0.516): between the 4-bit refined tier and the full-scan
    # pq8 refine — cell pruning trades exactly the recall the missed
    # cells held
    assert rows["ivfpq8_refined"].recall_at_5 >= 0.48
    assert (
        pq4["ivfpq_refined"]
        < rows["ivfpq8_refined"].recall_at_5
        < rows["pq8_refined"].recall_at_5
    )


@pytest.mark.slow
def test_pq8_rows_flow_into_the_frontier(spark):
    """The frontier carries both pq8 tiers with the right cost shape:
    full-corpus ADC scan, zero full reads for the pure-ADC tier,
    |queries| x C reads for the refined one, 4 B/vector footprint."""
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits
    from weather_flink_spark.plans.analytics_wave74 import refine_shortlist

    rows = {
        r.tier: r
        for r in all_specs()["q_sim_tier_frontier"].fn(spark, SF).collect()
    }
    d = corpus_digits(spark, SF)
    for t in ("pq8_adc", "pq8_refined"):
        assert rows[t].index_bytes_per_vector == 4
        assert rows[t].cost_basis == "measured"
    assert rows["pq8_adc"].full_vector_reads == 0
    assert (
        rows["pq8_refined"].full_vector_reads
        == w56.N_PANEL * refine_shortlist(d)
    )
    assert rows["pq8_adc"].scanned_candidates == rows["exhaustive"].scanned_candidates
    # the headline fact: the standard width + refine tops every other
    # PQ tier, at a footprint between pq (2 B) and ivfpq (10 B)
    assert rows["pq8_refined"].recall_at_5 > rows["ivfpq_refined"].recall_at_5
    # the IVF+PQ8 composition scans only probed-cell members (the same
    # measured count as every scaled-probe IVF tier) at 12 B/vector
    assert rows["ivfpq8_refined"].index_bytes_per_vector == 12
    assert rows["ivfpq8_refined"].scanned_candidates == rows["ivf"].scanned_candidates
    assert (
        rows["ivfpq8_refined"].full_vector_reads
        == rows["pq8_refined"].full_vector_reads
    )
