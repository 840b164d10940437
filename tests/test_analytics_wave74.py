"""Wave-74: the IVFADC exact-rerank REFINE stage (r10 verdict task #1)
and the digit-scaled IVF nprobe (task #5)."""

from __future__ import annotations
import pytest

from weather_flink_spark.plans import analytics_wave56 as w56
from weather_flink_spark.plans import analytics_wave74 as w74
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"


def test_refine_widths_are_digit_scaled():
    """Both refine knobs follow the engine's scaled-width convention
    (affine in d-1, r9 constants reproduced at the d=3 fixture) and
    the oracle computes the same values from the sz scalar subquery."""
    from weather_flink_spark.plans.similarity_extra import (
        IVF_NPROBE_SQL,
        ivf_nprobe,
    )

    assert ivf_nprobe(3) == 2  # the r7-r10 constant: fixture unchanged
    assert ivf_nprobe(4) == 3
    assert w74.refine_shortlist(3) == 80
    assert w74.refine_shortlist(4) == 120
    assert w74.refine_shortlist(10) == 360  # logarithmic at 10^9 vectors
    assert "(SELECT d FROM sz) - 1" in IVF_NPROBE_SQL
    assert "(SELECT d FROM sz) - 1" in w74.REFINE_SHORTLIST_SQL
    oracle = all_specs()["q_sim_ann_ivfpq_refined"].oracle
    assert IVF_NPROBE_SQL in oracle
    assert w74.REFINE_SHORTLIST_SQL in oracle
    assert "sz AS (" in oracle


def test_refined_panel_search_matches_gate_on_gate_queries(spark):
    """The refined panel run (n_queries=100) must agree row-for-row
    with the 5-query gate entry on the gate queries — the panel only
    widens the query set (the wave-70 discipline)."""
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES

    gate = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in all_specs()["q_sim_ann_ivfpq_refined"].fn(spark, SF).collect()
    }
    panel_res = w74.ivfpq_refined_panel_result_table(spark, SF)
    panel = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in panel_res.filter(panel_res.query_id < IVF_N_QUERIES).collect()
    }
    assert gate == panel and len(gate) > 0


def test_refined_shortlist_is_a_widened_ivfpq(spark):
    """Dropping the refined searcher's widths back to the baseline
    constants must reproduce q_sim_ann_ivfpq exactly — the refine
    stage is ONLY an operating-point change of the same composed
    search (no second code path to drift)."""
    from weather_flink_spark.plans.analytics_wave15 import (
        IVFPQ_NPROBE,
        IVFPQ_SHORTLIST,
        _ivfpq_search,
    )

    base = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in all_specs()["q_sim_ann_ivfpq"].fn(spark, SF).collect()
    }
    narrowed = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in _ivfpq_search(
            spark, SF, nprobe=IVFPQ_NPROBE, shortlist=IVFPQ_SHORTLIST
        ).collect()
    }
    assert base == narrowed and len(base) > 0


@pytest.mark.slow
def test_refined_recall_floor_at_sf01():
    """THE r10 verdict task #1 done-bar, pinned at the scale where the
    PQ floor was published: the refined tier's 100-query panel recall
    at sf0.1 must read >= binary64's 0.326 (measured r11: 0.388 vs
    ivfpq's 0.114), and >= the binary64 row of the same run. One
    deliberate sf0.1 test — the fixture floors live in
    test_analytics_wave70."""
    import pytest

    from pathlib import Path

    if not Path(SF01).exists():  # pragma: no cover
        pytest.skip("sf0.1 testdata absent")
    from weather_flink_spark.session import get_spark

    spark = get_spark("wave74_sf01_floor")
    specs = all_specs()
    pq = {
        r.tier: r.recall_at_5
        for r in specs["q_sim_recall_panel_pq"].fn(spark, SF01).collect()
    }
    binary = {
        r.tier: r.recall_at_5
        for r in specs["q_sim_recall_panel"].fn(spark, SF01).collect()
    }
    assert pq["ivfpq_refined"] >= 0.326, pq
    assert pq["ivfpq_refined"] >= binary["binary64"], (pq, binary)
    assert pq["ivfpq_refined"] > pq["ivfpq"] + 0.1, pq
    # task #5's done-bar rides along: the scaled-nprobe IVF row at
    # sf0.1 (d=4 -> nprobe 3) clears the verdict's expected >= 0.6
    # (measured r11: 0.608; it read 0.474 at the scale-blind nprobe=2)
    assert binary["ivf"] >= 0.6, binary


def test_opq_refined_panel_matches_gate_on_gate_queries(spark):
    """The OPQ-refined panel run (n_queries=100) agrees row-for-row
    with its 5-query gate entry on the gate queries (the panel only
    widens the query set), and the rotated-code refine stage never
    reads recall below the natural-code one at the fixture (rotation
    is an isometry — it can only help or wash out, never hurt)."""
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES
    from weather_flink_spark.plans.registry import all_specs

    gate = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in all_specs()["q_sim_ann_opq_refined"].fn(spark, SF).collect()
    }
    panel_res = w74.opq_refined_panel_result_table(spark, SF)
    panel = {
        (r.query_id, r.vec_id, r.k_rank)
        for r in panel_res.filter(panel_res.query_id < IVF_N_QUERIES).collect()
    }
    assert gate == panel and len(gate) > 0
    rows = {
        r.tier: r.recall_at_5
        for r in all_specs()["q_sim_recall_panel_pq"].fn(spark, SF).collect()
    }
    assert rows["opq_refined"] >= rows["ivfpq_refined"] - 0.02


def test_panel_caches_are_shared_not_rebuilt(spark):
    """The refined panel result is session-cached like every other
    index artifact: two reads return the same object's rows (the
    frontier re-reads it, so a rebuild would double the panel cost)."""
    a = w74.ivfpq_refined_panel_result_table(spark, SF)
    b = w74.ivfpq_refined_panel_result_table(spark, SF)
    assert a is b
    n = a.count()
    assert n == w56.N_PANEL * 5  # top-5 per panel query
