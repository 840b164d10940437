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
from weather_flink_spark.operators.snapshot import snapshot

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
        ).transform(snapshot()),
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
        ).transform(snapshot()),
    )

# ---------------------------------------------------------------------------
# OPQ-refined: the full production stack (OPQ rotation + IVF routing +
# ADC over rotated codes + exact rerank), same digit-scaled widths
# ---------------------------------------------------------------------------


def _opq_lut(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    """Wide ADC lookup table over the ROTATED basis: (query_id, code,
    ld2_0..3) — exact-decimal subspace distances between each rotated
    query and each rotated codeword (the wave-25 arithmetic in the
    wave-15 searcher's LUT shape)."""
    from pyspark.sql import functions as F

    from weather_flink_spark.operators.opq import OPQ_M
    from weather_flink_spark.plans.analytics_wave25 import (
        _PQ_KC,
        _dist_cols_spark,
        opq_rotated_table,
    )

    rq = opq_rotated_table(spark, sf_dir)
    q = rq.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("rq").alias("q_rq")
    )
    cb = rq.filter(F.col("vec_id") < _PQ_KC).select(
        F.col("vec_id").alias("code"), F.col("rq").alias("c_rq")
    )
    return q.join(F.broadcast(cb)).select(
        "query_id",
        "code",
        *[
            F.expr(_dist_cols_spark("q_rq", "c_rq", m)).alias(f"ld2_{m}")
            for m in range(OPQ_M)
        ],
    )


def _opq_refined_search(
    spark: SparkSession, sf_dir: str, n_queries: int
) -> DataFrame:
    """The wave-15 IVFADC searcher with the ROTATED code/LUT pair at
    the digit-scaled refine widths: probe routing and the exact cosine
    re-rank stay in the ORIGINAL space (rotation is an isometry applied
    to the codes, not to the stored vectors); only the per-candidate
    ADC arithmetic reads the OPQ artifacts."""
    from weather_flink_spark.plans.analytics_wave25 import opq_codes_table

    d = corpus_digits(spark, sf_dir)
    return _ivfpq_search(
        spark,
        sf_dir,
        n_queries=n_queries,
        nprobe=ivf_nprobe(d),
        shortlist=refine_shortlist(d),
        codes=opq_codes_table(spark, sf_dir),
        lut=_opq_lut(spark, sf_dir, n_queries),
    )


def _opq_refined_oracle() -> str:
    from weather_flink_spark.operators.opq import OPQ_M
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        _kmeans_dist_duck,
    )
    from weather_flink_spark.plans.analytics_wave25 import (
        _PQ_KC,
        _dist_cols_duck,
        _opq_replay_parts,
    )
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
        ivf_assigned_cte,
    )

    opq_codes = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, code FROM oc{m}" for m in range(OPQ_M)
    )
    opq_lut = " UNION ALL ".join(
        f"""SELECT q.vec_id AS query_id, {m} AS m, c.vec_id AS code,
                   {_dist_cols_duck('q.rq', 'c.rq', m)} AS d2q
            FROM rotq q JOIN rotq c ON c.vec_id < {_PQ_KC}
            WHERE q.vec_id < {IVF_N_QUERIES}"""
        for m in range(OPQ_M)
    )
    return (
        "WITH RECURSIVE "
        + SZ_CTE
        + ",\n        "
        + ", ".join(_opq_replay_parts())
        + f""",
        {ivf_assigned_cte()},
        oprobes AS MATERIALIZED (
            SELECT query_id, probe_cell FROM (
                SELECT q.vec_id AS query_id, c.cid AS probe_cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_kmeans_dist_duck('q.embedding', 'c.c')} ASC,
                                    c.cid ASC) AS rn
                FROM embeddings q CROSS JOIN cent{KMEANS_ITERS} c
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE rn <= {IVF_NPROBE_SQL}
        ),
        olut AS MATERIALIZED ({opq_lut}),
        ocand AS MATERIALIZED (
            SELECT p.query_id, v.vec_id, v.cell, SUM(l.d2q) AS adc
            FROM oprobes p
            JOIN assigned v
              ON v.cell = p.probe_cell AND v.vec_id <> p.query_id
            JOIN ({opq_codes}) cd ON cd.vec_id = v.vec_id
            JOIN olut l
              ON l.query_id = p.query_id AND l.m = cd.m AND l.code = cd.code
            GROUP BY p.query_id, v.vec_id, v.cell
        ),
        oshort AS (
            SELECT query_id, vec_id, cell, adc FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY adc ASC, vec_id ASC
                ) AS s_rank FROM ocand
            ) WHERE s_rank <= {REFINE_SHORTLIST_SQL}
        )
        SELECT query_id, vec_id, cell, adc_d2, cosine, k_rank FROM (
            SELECT s.query_id, s.vec_id, s.cell,
                   CAST(s.adc AS DOUBLE) AS adc_d2,
                   {_cos_duck('q.embedding', 'v.embedding')} AS cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.query_id
                       ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                s.vec_id ASC
                   ) AS k_rank
            FROM oshort s
            JOIN embeddings q ON q.vec_id = s.query_id
            JOIN embeddings v ON v.vec_id = s.vec_id
        ) WHERE k_rank <= {IVF_TOP_K}
    """
    )


@register(
    "q_sim_ann_opq_refined",
    oracle=_opq_refined_oracle(),
    doc=(
        "OPQ-refined ANN search (r11): the FULL production PQ stack — "
        "OPQ Householder rotation, trained-IVF routing (digit-scaled "
        "nprobe = d-1, ORIGINAL space), ADC over the ROTATED 4-byte "
        "codes via a broadcast rotated-basis LUT, and exact cosine "
        "re-rank of the digit-scaled C = 40(d-1) shortlist — i.e. the "
        "FAISS OPQ+IVFPQ+RefineFlat composition, run through the SAME "
        "wave-15 searcher with the code/LUT pair swapped (rotation is "
        "an isometry of the codes; probe routing and the re-rank never "
        "leave the stored-vector space). Measured panel recall: 0.518 / "
        "0.482 / 0.392 at sf0.001/0.01/0.1 vs the natural-code refined "
        "tier's 0.512 / 0.478 / 0.388 — the honest finding is that "
        "OPQ's unrefined near-2x code-quality gain (0.050 -> 0.092 at "
        "sf0.1) largely WASHES OUT through the refine stage: at "
        "C = 40(d-1) the exact re-rank recovers most of what better "
        "codes buy, because both shortlists already contain nearly the "
        "same true neighbors. Rotation still never hurts (>= the "
        "natural tier at every SF), but the rerank budget, not code "
        "quality, is the binding constraint here. Oracle replays the "
        "OPQ pipeline, probe routing, rotated ADC, shortlist, and "
        "re-rank with both widths from the sz scalar subquery."
    ),
    tags=("similarity", "ann", "ivf", "pq", "opq", "llm-pipeline"),
)
def q_sim_ann_opq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "opq_refined_ann_result",
        spark,
        sf_dir,
        lambda: _opq_refined_search(
            spark, sf_dir, IVF_N_QUERIES
        ).transform(snapshot()),
    )


def opq_refined_panel_result_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-cached OPQ-refined search over the 100-query panel."""
    from weather_flink_spark.plans.analytics_wave56 import N_PANEL
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "opq_refined_result_panel",
        spark,
        sf_dir,
        lambda: _opq_refined_search(spark, sf_dir, N_PANEL).transform(snapshot()),
    )
