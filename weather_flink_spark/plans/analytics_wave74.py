"""Wave-74 operator (round 11): the IVFADC exact-rerank REFINE stage
(r10 verdict task #1).

The r10 PQ panel published the honest floor: 4-byte PQ codes are the
engine's weakest tier at scale (q_sim_recall_panel_pq at sf0.1: pq_adc
0.050, opq_adc 0.092, ivfpq 0.114 vs binary64 0.326, binary256 0.736).
The standard fix — the FAISS ``IndexRefineFlat`` shape — is a REFINE
stage: take a much wider ADC shortlist than the requested k, then
exactly re-rank those C candidates by true cosine. The baseline
``ivfpq`` searcher already re-ranks, but its widths are the 5-query-
gate-era constants (nprobe=2, shortlist 15 = 3k); this entry runs the
SAME composed searcher (wave-15 ``_ivfpq_search`` verbatim) at the
digit-scaled operating point:

- ``nprobe = d-1``  — the r11 scaled IVF probe count
  (similarity_extra.ivf_nprobe, r10 verdict task #5 convention);
- ``shortlist C = REFINE_KFACTOR * k * (d-1) = 40(d-1)`` — the rerank
  budget, FAISS's ``k_factor`` made digit-scaled: 80 at the d=3
  fixture, 120 at sf0.1 (d=4), 360 at a d=10 (10^9-vector) corpus —
  logarithmic in corpus size, so the full-precision read stays a
  rounding error of the scan at 100 TB.

Measured effect (100-query panel recall@5): fixture 0.250 -> 0.512;
sf0.1 0.114 -> 0.388 — past the r10 verdict's floor (binary64's
0.326) with margin, at 10 B/vector instead of binary64's 16 B. Why
BOTH knobs must move together: scaling nprobe alone (3 cells, fixed
shortlist 15) measurably HURTS at sf0.1 (0.114 -> 0.106) — wider
probes dilute a fixed shortlist with ADC-noise candidates; the rerank
budget is what converts probe width into recall.

The oracle replays the identical search (wave-15's parametrized
oracle) with both widths computed from the ``sz`` scalar subquery, so
one fixed SQL string adapts per sf.

Scale: identical shape to q_sim_ann_ivfpq — full vectors stay
partitioned by cell, per-candidate work is 4 broadcast-LUT lookups,
full-precision reads bounded at |queries| x C with C growing only
with corpus DIGITS.

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_flink_spark.plans.analytics_wave15 import (
    _ivfpq_oracle,
    _ivfpq_search,
)
from weather_flink_spark.plans.analytics_wave20 import SZ_CTE, corpus_digits
from weather_flink_spark.plans.llm_extra import IVF_TOP_K
from weather_flink_spark.plans.registry import register
from weather_flink_spark.plans.similarity_extra import (
    IVF_NPROBE_SQL,
    ivf_nprobe,
)

# rerank budget per requested neighbor per corpus digit (FAISS
# IndexRefineFlat's k_factor, digit-scaled): C = 8 * k * (d-1)
REFINE_KFACTOR = 8

REFINE_SHORTLIST_SQL = (
    f"({REFINE_KFACTOR} * {IVF_TOP_K} * ((SELECT d FROM sz) - 1))"
)


def refine_shortlist(d: int) -> int:
    """Digit-scaled exact-rerank budget: 40(d-1) — 80 at the d=3
    fixture, 120 at sf0.1 (d=4). Affine in (d-1) like every other
    scaled search width; the oracle computes the same value from the
    sz scalar subquery."""
    return REFINE_KFACTOR * IVF_TOP_K * (d - 1)


@register(
    "q_sim_ann_ivfpq_refined",
    oracle=_ivfpq_oracle(
        nprobe_sql=IVF_NPROBE_SQL,
        shortlist_sql=REFINE_SHORTLIST_SQL,
        prelude=SZ_CTE + ",\n        ",
    ),
    doc=(
        "IVFADC + exact-rerank REFINE stage (r10 verdict task #1; the "
        "FAISS IndexRefineFlat shape): the wave-15 composed IVF+PQ "
        "searcher run verbatim at the digit-scaled operating point — "
        "nprobe = d-1 probed cells (the r11 scaled IVF knob) and an "
        "ADC shortlist of C = 40(d-1) candidates (the rerank budget, "
        "k_factor 8 x k, digit-scaled: 80 at the d=3 fixture, 120 at "
        "sf0.1) exactly re-ranked by true cosine to the final top-5. "
        "Lifts the PQ tier's panel recall from the r10 floor 0.114 to "
        "0.388 at sf0.1 — past binary64's 0.326 at 10 B/vector vs "
        "16 B. Scaling nprobe alone HURTS (0.114 -> 0.106 at sf0.1): "
        "wider probes dilute a fixed shortlist with ADC noise; the "
        "rerank budget converts probe width into recall. Oracle "
        "replays the identical search with both widths from the sz "
        "scalar subquery. Scale: full vectors stay cell-partitioned, "
        "candidates cost 4 broadcast-LUT lookups, full-precision "
        "reads bounded at |queries| x C with C logarithmic in corpus "
        "size."
    ),
    tags=("similarity", "ann", "ivf", "pq", "llm-pipeline"),
)
def q_sim_ann_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    d = corpus_digits(spark, sf_dir)
    return _cached(
        "ivfpq_refined_ann_result",
        spark,
        sf_dir,
        lambda: _ivfpq_search(
            spark,
            sf_dir,
            nprobe=ivf_nprobe(d),
            shortlist=refine_shortlist(d),
        ).localCheckpoint(),
    )


def ivfpq_refined_panel_result_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-cached refined IVFADC search over the 100-query panel
    (the gate result covers only the 5 gate queries) — the wave-70
    panel's ivfpq_refined tier and the frontier read this."""
    from weather_flink_spark.plans.analytics_wave56 import N_PANEL
    from weather_flink_spark.plans.llm_pipeline import _cached

    d = corpus_digits(spark, sf_dir)
    return _cached(
        "ivfpq_refined_result_panel",
        spark,
        sf_dir,
        lambda: _ivfpq_search(
            spark,
            sf_dir,
            n_queries=N_PANEL,
            nprobe=ivf_nprobe(d),
            shortlist=refine_shortlist(d),
        ).localCheckpoint(),
    )
