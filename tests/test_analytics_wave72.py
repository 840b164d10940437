"""Wave-72: the recall-vs-cost frontier (r9 verdict task #5 — the
done-bar: monotone facts pinned)."""

from __future__ import annotations
import pytest

from weather_flink_spark.plans import analytics_wave56 as w56
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"

ALL_TIERS = {
    "exhaustive",
    "binary64",
    "binary256",
    "binary256_sampled",
    "ivf",
    "pq_adc",
    "opq_adc",
    "ivfpq",
    "ivfpq_refined",
    "opq_refined",
    "pq8_adc",
    "pq8_refined",
    "ivfpq8_refined",
    "flat_graph",
    "hnsw",
}


@pytest.mark.slow
def test_frontier_monotone_facts(spark):
    rows = {
        r.tier: r
        for r in all_specs()["q_sim_tier_frontier"].fn(spark, SF).collect()
    }
    assert set(rows) == ALL_TIERS
    ex = rows["exhaustive"]
    # the anchor: exhaustive recalls everything at full cost — COMPUTED
    # from the ground truth joined to itself, not asserted by fiat
    assert ex.recall_at_5 == 1.0
    assert ex.scanned_candidates == ex.full_vector_reads
    assert ex.index_bytes_per_vector == 512

    for r in rows.values():
        assert 0.0 <= r.recall_at_5 <= 1.0
        # nothing recalls more than exhaustive or costs more than it
        assert r.recall_at_5 <= ex.recall_at_5
        assert r.scanned_candidates <= ex.scanned_candidates
        assert r.full_vector_reads <= ex.full_vector_reads
        assert r.cost_basis in ("measured", "provisioned")

    # the wider binary code buys recall at the same scan count
    assert rows["binary256"].recall_at_5 > rows["binary64"].recall_at_5
    assert rows["binary256"].scanned_candidates == rows["binary64"].scanned_candidates
    # PQ: smallest footprint in the engine, zero full-precision reads
    for t in ("pq_adc", "opq_adc"):
        assert rows[t].index_bytes_per_vector == 2
        assert rows[t].full_vector_reads == 0
    # the composed IVFADC reads only its shortlist, far under a rerank
    # pool scan of the probed cells — at BOTH operating points (the
    # r11 refined tier's 40(d-1) budget stays under the scaled-probe
    # full scan too)
    assert rows["ivfpq"].full_vector_reads < rows["ivf"].full_vector_reads
    assert (
        rows["ivfpq_refined"].full_vector_reads < rows["ivf"].full_vector_reads
    )
    # the refine stage buys recall with bounded extra full reads at the
    # same 10 B/vector footprint
    assert rows["ivfpq_refined"].recall_at_5 > rows["ivfpq"].recall_at_5
    assert (
        rows["ivfpq_refined"].index_bytes_per_vector
        == rows["ivfpq"].index_bytes_per_vector
    )
    assert (
        rows["ivfpq_refined"].full_vector_reads
        > rows["ivfpq"].full_vector_reads
    )
    # graph budgets are provisioned and strictly under the exhaustive
    # scan even at the 500-vector fixture (the budget/exhaustive ratio
    # SHRINKS with scale — digit-scaled vs linear; pinned in
    # test_graph_budgets_are_digit_scaled)
    for t in ("flat_graph", "hnsw"):
        assert rows[t].cost_basis == "provisioned"
        assert rows[t].scanned_candidates < ex.scanned_candidates


def test_frontier_recalls_match_panel_entries(spark):
    """The frontier's recall column IS the panels' — same values,
    joined (the frontier adds cost axes, never a second recall
    source)."""
    specs = all_specs()
    frontier = {
        r.tier: r.recall_at_5
        for r in specs["q_sim_tier_frontier"].fn(spark, SF).collect()
    }
    for panel in (
        "q_sim_recall_panel",
        "q_sim_recall_panel_graph",
        "q_sim_recall_panel_pq",
    ):
        for r in specs[panel].fn(spark, SF).collect():
            assert frontier[r.tier] == r.recall_at_5, (panel, r.tier)


def test_graph_budgets_are_digit_scaled():
    """Provisioned budgets grow with corpus digits — the same d
    convention as every other graph knob."""
    from weather_flink_spark.plans import analytics_wave72 as w72

    f3, h3 = w72._graph_budgets(3)
    f4, h4 = w72._graph_budgets(4)
    assert f3 == 8 + 3 * 4 * 8 == 104
    assert h3 == 3 + 3 * 8 * 8 + 6 + 3 * 4 * 8 == 297
    assert f4 > f3 and h4 > h3
    # the point of a traversal index: the provisioned budget grows
    # with corpus DIGITS while the exhaustive scan grows linearly, so
    # the budget/exhaustive ratio shrinks an order of magnitude per
    # decade (500-vector fixture vs the 2000-vector sf0.1 corpus
    # already shows it; at 10^9 vectors the d=10 budget is ~1e-6 of
    # the scan)
    assert h4 / 1999 < h3 / 499
    assert f4 / 1999 < f3 / 499
    assert w56.N_PANEL == 100  # budgets in the entry are panel totals
