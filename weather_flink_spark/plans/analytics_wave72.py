"""Wave-72 operator (round 10): the recall-vs-cost FRONTIER — the
operating-point table an index-selection job reads (r9 verdict task
#5).

With fifteen searcher tiers each reporting panel recall, the missing
artifact was the joined view a capacity planner actually uses: for
every tier, WHAT recall does it buy at WHAT scan cost and WHAT index
footprint. ``q_sim_tier_frontier`` emits one row per tier:

- ``recall_at_5``   — the tier's 100-query panel recall (the three
  panel entries' exact numbers: wave-56 binary/IVF, wave-58 graph,
  wave-70 PQ), plus an ``exhaustive`` row scored from the ground
  truth itself (recall 1.0 by construction — computed, not asserted);
- ``cost_basis``    — ``measured`` where the candidate count is exact
  from data (scan tiers: corpus-sized code scans, probed-cell member
  counts), ``provisioned`` for the two graph-traversal tiers whose
  per-query candidate count varies with the frontier — there the
  number is the structural budget (entries + hops x beam x degree)
  the operator must provision for, i.e. the planner's number;
- ``scanned_candidates`` — total candidate evaluations across the
  100-query panel (Hamming words, ADC lookups, cosine evaluations —
  each tier's cheap unit);
- ``full_vector_reads`` — total full-precision vectors read across
  the panel (the expensive unit: rerank pools, shortlists, probed
  members; 0 for the pure-ADC tiers — they never touch a vector);
- ``index_bytes_per_vector`` — logical index footprint per corpus
  vector: raw doubles 512 B (exhaustive), sign-bit 16 B, thermometer
  32 B, IVF cell id 8 B, PQ 2 B (4 codes x 4 bits), IVFPQ and its r11
  refined operating point 10 B (codes + cell), flat graph 8 x degree(d) (digit-scaled!), HNSW
  10 x degree(d) (base edges + the ~25% coarse layer's own edges
  amortized: 0.25 x 8 x degree = 2 x degree).

Monotone facts pinned in tests: exhaustive reads everything and
recalls 1.0; binary256 beats binary64 at equal scan count; the PQ
tiers hold the smallest footprint with zero full reads; every tier's
cost is bounded by the exhaustive scan.

The oracle nests the three panel oracles verbatim (their own WITH
scopes), replays the IVF probed-member count, and computes every cost
formula from the same ``sz``/COUNT scalar subqueries — one SQL, fully
hash-exact. Scale: the frontier is an audit-sized join over panel
totals and closed-form budgets; nothing here scans data beyond what
the panels already scan.

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.analytics_wave56 import N_PANEL, PANEL_K
from weather_flink_spark.plans.registry import register

# logical index footprints (bytes per corpus vector); the digit-scaled
# graph figures are computed at runtime from d
_BYTES_RAW = 512  # 64 doubles
_BYTES_B64 = 16  # 2 packed words
_BYTES_B256 = 32  # 4 packed words
_BYTES_IVF = 8  # cell id
_BYTES_PQ = 2  # 4 codes x 4 bits (16 codewords)
_BYTES_IVFPQ = 10  # PQ codes + cell id
_BYTES_PQ8 = 4  # 4 codes x 8 bits (256 codewords, the r11 wave-77 width)
_BYTES_IVFPQ8 = 12  # 8-bit codes + the 8 B cell id every IVF tier carries


def _graph_budgets(d: int) -> tuple[int, int]:
    """(flat, hnsw) provisioned candidate budgets PER QUERY: entries +
    hops x beam x degree per traversal stage — the structural ceiling
    the searchers' bounded frontiers can evaluate, every factor the
    published digit-scaled width."""
    from weather_flink_spark.plans.analytics_wave4 import KMEANS_K
    from weather_flink_spark.plans.analytics_wave20 import (
        g_beam,
        g_degree,
        g_hops,
    )
    from weather_flink_spark.plans.analytics_wave26 import (
        _descent_ef,
        _entry_m,
        _l0_beam,
        _l1_beam,
    )

    flat = KMEANS_K + g_hops(d) * g_beam(d) * g_degree(d)
    hnsw = (
        _entry_m(d)
        + 3 * _l1_beam(d) * g_degree(d)
        + _descent_ef(d)
        + 3 * _l0_beam(d) * g_degree(d)
    )
    return flat, hnsw


def ivf_probed_members_total(
    spark: SparkSession, sf_dir: str, nprobe: int = 2
) -> int:
    """Measured: total members of the panel queries' top-``nprobe``
    trained cells (self excluded) — the exact candidate count the IVF
    and IVFPQ tiers evaluate across the panel (nprobe=2 for the
    baseline ivfpq tier; the digit-scaled d-1 for the r11 ivf and
    ivfpq_refined tiers). Bounded collect: 1 value."""
    from weather_flink_spark.plans.analytics_wave4 import (
        _kmeans_dist_col,
        kmeans_final_assignment,
    )
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    assigned = ivf_assigned_table(spark, sf_dir)
    cent, _ = kmeans_final_assignment(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < N_PANEL).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cd2").asc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "cid", _kmeans_dist_col("q_emb", "c").alias("cd2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("probe_cell"))
    )
    return (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        ).count()
    )


def _frontier_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        KMEANS_K,
        _kmeans_dist_duck,
    )
    from weather_flink_spark.plans.analytics_wave15 import IVFPQ_SHORTLIST
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE
    from weather_flink_spark.plans.analytics_wave74 import REFINE_SHORTLIST_SQL
    from weather_flink_spark.plans.similarity_extra import IVF_NPROBE_SQL
    from weather_flink_spark.plans.analytics_wave43 import _BQ_CAND
    from weather_flink_spark.plans.analytics_wave49 import _B256_CAND_SQL
    from weather_flink_spark.plans.analytics_wave56 import (
        _panel_oracle,
        panel_exact_cte,
    )
    from weather_flink_spark.plans.analytics_wave58 import _graph_panel_oracle
    from weather_flink_spark.plans.analytics_wave70 import _pq_panel_oracle
    from weather_flink_spark.plans.analytics_wave77 import _pq8_panel_oracle
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    d = "(SELECT d FROM sz)"
    g_deg = f"(4 * ({d} - 1))"
    flat_budget = (
        f"({KMEANS_K} + LEAST(2 * {d} - 3, 7) * (2 * ({d} - 1)) * {g_deg})"
    )
    hnsw_budget = (
        f"((2 * {d} - 3) + 3 * (5 * {d} - 7) * {g_deg}"
        f" + (5 * {d} - 9) + 3 * (3 * {d} - 5) * {g_deg})"
    )
    scan_all = f"({N_PANEL} * ((SELECT n FROM nn) - 1))"
    # NOTE deliberate shape: the three panel replays are nested as
    # plain FROM-subqueries and the costs live in ONE subquery-local
    # WITH. Wrapping the panel texts in outer `WITH x AS MATERIALIZED`
    # CTEs instead sends DuckDB's planner down a superlinear path
    # (measured r10: ~12-18 s planning for the identical semantics vs
    # ~2 s this way; execution is ~6 s either way).
    costs = f"""(
        WITH {SZ_CTE},
        nn AS (SELECT COUNT(*) AS n FROM embeddings),
        {ivf_assigned_cte()},
        iprob AS (
            SELECT query_id, probe_cell, rn FROM (
                SELECT q.vec_id AS query_id, c.cid AS probe_cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_kmeans_dist_duck('q.embedding', 'c.c')} ASC,
                                    c.cid ASC) AS rn
                FROM embeddings q CROSS JOIN cent{KMEANS_ITERS} c
                WHERE q.vec_id < {N_PANEL}
            ) WHERE rn <= {IVF_NPROBE_SQL}
        ),
        icand2 AS (
            -- baseline ivfpq operating point: nprobe fixed at 2
            SELECT CAST(COUNT(*) AS BIGINT) AS c
            FROM iprob p JOIN assigned v
              ON v.cell = p.probe_cell AND v.vec_id <> p.query_id
            WHERE p.rn <= 2
        ),
        icands AS (
            -- digit-scaled nprobe = d-1: the r11 ivf + ivfpq_refined point
            SELECT CAST(COUNT(*) AS BIGINT) AS c
            FROM iprob p JOIN assigned v
              ON v.cell = p.probe_cell AND v.vec_id <> p.query_id
        )
        SELECT 'exhaustive' AS tier, 'measured' AS cost_basis,
               CAST({scan_all} AS BIGINT) AS scanned_candidates,
               CAST({scan_all} AS BIGINT) AS full_vector_reads,
               CAST({_BYTES_RAW} AS BIGINT) AS index_bytes_per_vector
        UNION ALL SELECT 'binary64', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST({N_PANEL} * {_BQ_CAND} AS BIGINT),
               CAST({_BYTES_B64} AS BIGINT)
        UNION ALL SELECT 'binary256', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST({N_PANEL} * {_B256_CAND_SQL} AS BIGINT),
               CAST({_BYTES_B256} AS BIGINT)
        UNION ALL SELECT 'binary256_sampled', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST({N_PANEL} * {_B256_CAND_SQL} AS BIGINT),
               CAST({_BYTES_B256} AS BIGINT)
        UNION ALL SELECT 'ivf', 'measured',
               (SELECT c FROM icands),
               (SELECT c FROM icands),
               CAST({_BYTES_IVF} AS BIGINT)
        UNION ALL SELECT 'pq_adc', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST(0 AS BIGINT),
               CAST({_BYTES_PQ} AS BIGINT)
        UNION ALL SELECT 'opq_adc', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST(0 AS BIGINT),
               CAST({_BYTES_PQ} AS BIGINT)
        UNION ALL SELECT 'ivfpq', 'measured',
               (SELECT c FROM icand2),
               CAST({N_PANEL} * {IVFPQ_SHORTLIST} AS BIGINT),
               CAST({_BYTES_IVFPQ} AS BIGINT)
        UNION ALL SELECT 'ivfpq_refined', 'measured',
               (SELECT c FROM icands),
               CAST({N_PANEL} * {REFINE_SHORTLIST_SQL} AS BIGINT),
               CAST({_BYTES_IVFPQ} AS BIGINT)
        UNION ALL SELECT 'opq_refined', 'measured',
               (SELECT c FROM icands),
               CAST({N_PANEL} * {REFINE_SHORTLIST_SQL} AS BIGINT),
               CAST({_BYTES_IVFPQ} AS BIGINT)
        UNION ALL SELECT 'pq8_adc', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST(0 AS BIGINT),
               CAST({_BYTES_PQ8} AS BIGINT)
        UNION ALL SELECT 'pq8_refined', 'measured',
               CAST({scan_all} AS BIGINT),
               CAST({N_PANEL} * {REFINE_SHORTLIST_SQL} AS BIGINT),
               CAST({_BYTES_PQ8} AS BIGINT)
        UNION ALL SELECT 'ivfpq8_refined', 'measured',
               (SELECT c FROM icands),
               CAST({N_PANEL} * {REFINE_SHORTLIST_SQL} AS BIGINT),
               CAST({_BYTES_IVFPQ8} AS BIGINT)
        UNION ALL SELECT 'flat_graph', 'provisioned',
               CAST({N_PANEL} * {flat_budget} AS BIGINT),
               CAST({N_PANEL} * {flat_budget} AS BIGINT),
               CAST(8 * {g_deg} AS BIGINT)
        UNION ALL SELECT 'hnsw', 'provisioned',
               CAST({N_PANEL} * {hnsw_budget} AS BIGINT),
               CAST({N_PANEL} * {hnsw_budget} AS BIGINT),
               CAST(10 * {g_deg} AS BIGINT)
    ) c"""
    return f"""
        SELECT r.tier, r.recall_at_5, c.cost_basis,
               c.scanned_candidates, c.full_vector_reads,
               c.index_bytes_per_vector
        FROM (
            SELECT tier, recall_at_5 FROM ({_panel_oracle()})
            UNION ALL SELECT tier, recall_at_5 FROM ({_graph_panel_oracle()})
            UNION ALL SELECT tier, recall_at_5 FROM ({_pq_panel_oracle()})
            UNION ALL SELECT tier, recall_at_5 FROM ({_pq8_panel_oracle()})
            UNION ALL SELECT 'exhaustive' AS tier,
                   CAST((WITH {panel_exact_cte()}
                         SELECT COUNT(*) FROM panel_exact) AS DOUBLE)
                       / ({N_PANEL} * {PANEL_K}) AS recall_at_5
        ) r JOIN {costs} USING (tier)
    """


@register(
    "q_sim_tier_frontier",
    oracle=_frontier_oracle(),
    doc=(
        "Recall-vs-cost frontier over all fifteen searcher tiers (r10, r9 "
        "verdict task #5): panel recall@5 joined with each tier's "
        "scan cost (total candidate evaluations + total full-precision "
        "vector reads across the 100-query panel; measured from data "
        "for scan/IVF/PQ tiers, the structural provisioned budget for "
        "the two graph traversals) and logical index bytes per vector "
        "(raw 512, thermometer 32, sign-bit 16, IVFPQ 10, IVF 8, PQ 2, "
        "graph 8-10x digit-scaled degree) — the operating-point table "
        "an index-selection job reads. An exhaustive row computed from "
        "the ground truth itself anchors recall 1.0 at full cost. "
        "Oracle nests the three panel oracles verbatim plus the cost "
        "formulas from the same sz/COUNT scalar subqueries in one SQL."
    ),
    tags=("similarity", "ann", "evaluation", "scale"),
)
def q_sim_tier_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave15 import IVFPQ_SHORTLIST
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits, g_degree
    from weather_flink_spark.plans.analytics_wave43 import _BQ_CAND
    from weather_flink_spark.plans.analytics_wave49 import _b256_cand
    from weather_flink_spark.plans.analytics_wave56 import exact_topk_panel_table
    from weather_flink_spark.plans.llm_pipeline import emb_table
    from weather_flink_spark.plans.registry import all_specs

    specs = all_specs()
    from weather_flink_spark.plans.analytics_wave74 import refine_shortlist
    from weather_flink_spark.plans.similarity_extra import ivf_nprobe

    d = corpus_digits(spark, sf_dir)
    n = emb_table(spark, sf_dir).count()
    icand2 = ivf_probed_members_total(spark, sf_dir, nprobe=2)
    icands = (
        icand2
        if ivf_nprobe(d) == 2
        else ivf_probed_members_total(spark, sf_dir, nprobe=ivf_nprobe(d))
    )
    flat_b, hnsw_b = _graph_budgets(d)
    scan_all = N_PANEL * (n - 1)

    gt = exact_topk_panel_table(spark, sf_dir)
    exhaustive = gt.agg(F.count("*").alias("n_hits")).select(
        F.lit("exhaustive").alias("tier"),
        (F.col("n_hits").cast("double") / F.lit(N_PANEL * PANEL_K)).alias(
            "recall_at_5"
        ),
    )
    recalls = (
        specs["q_sim_recall_panel"].fn(spark, sf_dir).select("tier", "recall_at_5")
        .unionByName(
            specs["q_sim_recall_panel_graph"]
            .fn(spark, sf_dir)
            .select("tier", "recall_at_5")
        )
        .unionByName(
            specs["q_sim_recall_panel_pq"]
            .fn(spark, sf_dir)
            .select("tier", "recall_at_5")
        )
        .unionByName(
            specs["q_sim_recall_panel_pq8"]
            .fn(spark, sf_dir)
            .select("tier", "recall_at_5")
        )
        .unionByName(exhaustive)
    )
    rows = [
        ("exhaustive", "measured", scan_all, scan_all, _BYTES_RAW),
        ("binary64", "measured", scan_all, N_PANEL * _BQ_CAND, _BYTES_B64),
        ("binary256", "measured", scan_all, N_PANEL * _b256_cand(d), _BYTES_B256),
        (
            "binary256_sampled",
            "measured",
            scan_all,
            N_PANEL * _b256_cand(d),
            _BYTES_B256,
        ),
        ("ivf", "measured", icands, icands, _BYTES_IVF),
        ("pq_adc", "measured", scan_all, 0, _BYTES_PQ),
        ("opq_adc", "measured", scan_all, 0, _BYTES_PQ),
        ("ivfpq", "measured", icand2, N_PANEL * IVFPQ_SHORTLIST, _BYTES_IVFPQ),
        (
            "ivfpq_refined",
            "measured",
            icands,
            N_PANEL * refine_shortlist(d),
            _BYTES_IVFPQ,
        ),
        (
            "opq_refined",
            "measured",
            icands,
            N_PANEL * refine_shortlist(d),
            _BYTES_IVFPQ,
        ),
        ("pq8_adc", "measured", scan_all, 0, _BYTES_PQ8),
        (
            "pq8_refined",
            "measured",
            scan_all,
            N_PANEL * refine_shortlist(d),
            _BYTES_PQ8,
        ),
        (
            "ivfpq8_refined",
            "measured",
            icands,
            N_PANEL * refine_shortlist(d),
            _BYTES_IVFPQ8,
        ),
        (
            "flat_graph",
            "provisioned",
            N_PANEL * flat_b,
            N_PANEL * flat_b,
            8 * g_degree(d),
        ),
        ("hnsw", "provisioned", N_PANEL * hnsw_b, N_PANEL * hnsw_b, 10 * g_degree(d)),
    ]
    costs = spark.createDataFrame(
        rows,
        "tier string, cost_basis string, scanned_candidates bigint, "
        "full_vector_reads bigint, index_bytes_per_vector bigint",
    )
    return recalls.join(F.broadcast(costs), "tier").select(
        "tier",
        "recall_at_5",
        "cost_basis",
        "scanned_candidates",
        "full_vector_reads",
        "index_bytes_per_vector",
    )
