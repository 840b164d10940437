"""Wave-58 operator (round 9): the 100-query GRAPH-tier recall panel —
the follow-up the wave-56 panel named.

Wave-56 widened the binary/IVF tiers' recall read from 5 queries to a
100-query panel (one flipped hit = 0.002, not 0.04) but left the two
graph-traversal tiers (flat NSW, 2-layer HNSW) on the 5-query gates,
citing oracle-runtime risk. Measured, that risk is empirically absent:
the unrolled-CTE beam oracles are INDEX-BUILD-dominated — DuckDB replays
the HNSW oracle in ~14.5 s at 5 queries and ~15.0 s at 100 at sf0.001
(~9.9 s vs ~13.5 s at sf0.01), because the per-hop joins scale with the
bounded frontier while the multi-probe kNN edge build does not scale
with query count at all. So the 20x panel costs ~flat on the oracle
side and pennies on the Spark side (the beam work per query is bounded
by construction).

``q_sim_recall_panel_graph``: recall@5 over the SAME 100-query panel
and the SAME shared ``panel_exact`` ground-truth text as wave-56, one
output row per traversal tier:

- ``flat_graph`` — wave-20's multi-entry digit-scaled (2d-3) hop beam
  search (3 hops only at the d=3 fixture, 5 at sf0.1 — see
  ``g_hops()``) over the shared digit-scaled kNN index (r10: degree
  4(d-1) / probe d-1 — 8/2 at the fixture, 12/3 at sf0.1);
- ``hnsw`` — wave-26's 2-layer search (multi-medoid entry, 3 coarse
  hops, descent, 3 base hops over kNN + cross-cell edges).

This retires the LAST "noise-dominated recall gate" caveat (SURVEY
§15/§16): every searcher architecture in the engine now has a
panel-scale, oracle-exact recall read. It also pins at panel scale the
round-9 index upgrade this panel's pytest prototype exposed and drove
(in-cell degree-4 -> multi-probe degree-8: flat 0.242 -> 0.662, hnsw
0.454 -> 0.772 at the fixture).

Scale: the panel queries are a bounded broadcast side (100 rows); each
hop is one frontier x degree edge join — the searchers' own 100 TB
shape, unchanged. The oracle replays BOTH tiers' full index builds and
frontier evolutions in one SQL (each tier's build nests in its own CTE
scope, so the shared CTE names cannot collide).

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.plans.analytics_wave56 import N_PANEL, PANEL_K
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot


def _tier_row(tier: str, result: DataFrame, gt: DataFrame) -> DataFrame:
    hits = gt.join(
        result.select("query_id", "vec_id"), ["query_id", "vec_id"]
    ).agg(F.count("*").cast("bigint").alias("n_hits"))
    return hits.select(
        F.lit(tier).alias("tier"),
        F.lit(N_PANEL).cast("bigint").alias("n_queries"),
        "n_hits",
        (F.col("n_hits").cast("double") / F.lit(N_PANEL * PANEL_K)).alias(
            "recall_at_5"
        ),
    )


def _graph_panel_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave20 import _graph_oracle
    from weather_flink_spark.plans.analytics_wave26 import _hnsw_oracle
    from weather_flink_spark.plans.analytics_wave56 import panel_exact_cte

    def tier_select(tier: str, res: str) -> str:
        return f"""
            SELECT '{tier}' AS tier,
                   CAST({N_PANEL} AS BIGINT) AS n_queries,
                   CAST((
                       SELECT COUNT(*) FROM panel_exact e
                       JOIN {res} t ON t.query_id = e.query_id
                                   AND t.vec_id = e.vec_id
                   ) AS BIGINT) AS n_hits"""

    return f"""
        WITH flat_res AS MATERIALIZED ({_graph_oracle(N_PANEL)}),
        hnsw_res AS MATERIALIZED ({_hnsw_oracle(N_PANEL)}),
        {panel_exact_cte()}
        SELECT tier, n_queries, n_hits,
               CAST(n_hits AS DOUBLE) / ({N_PANEL} * {PANEL_K})
                   AS recall_at_5
        FROM (
            {tier_select('flat_graph', 'flat_res')}
            UNION ALL {tier_select('hnsw', 'hnsw_res')}
        )
    """


def flat_panel_result_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached flat-graph search over the 100-query panel (the
    gate result covers only the 5 gate queries)."""
    from weather_flink_spark.plans.analytics_wave20 import _graph_search
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "flat_result_panel",
        spark,
        sf_dir,
        lambda: _graph_search(spark, sf_dir, n_queries=N_PANEL).transform(snapshot()),
    )


def hnsw_panel_result_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached HNSW search over the 100-query panel."""
    from weather_flink_spark.plans.analytics_wave26 import _hnsw_search
    from weather_flink_spark.plans.llm_pipeline import _cached

    return _cached(
        "hnsw_result_panel",
        spark,
        sf_dir,
        lambda: _hnsw_search(spark, sf_dir, n_queries=N_PANEL),
    )


@register(
    "q_sim_recall_panel_graph",
    oracle=_graph_panel_oracle(),
    doc=(
        "100-query recall@5 panel over the two graph-traversal ANN "
        "tiers (r9, the wave-56 follow-up): flat NSW beam search and "
        "2-layer HNSW, each run with its gate entry's exact searcher "
        "over the SAME shared panel ground truth as the binary panel. "
        "Registered after measuring that the unrolled beam oracles are "
        "index-build-dominated (~15 s at 5 OR 100 queries), so the 20x "
        "panel is ~free — every searcher architecture now has a "
        "panel-scale oracle-exact recall read, retiring the last "
        "noise-dominated-gate caveat. Oracle replays both tiers' index "
        "builds and frontier evolutions plus the ground truth in one "
        "SQL."
    ),
    tags=("similarity", "ann", "graph", "hnsw", "evaluation"),
)
def q_sim_recall_panel_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave56 import exact_topk_panel_table

    gt = exact_topk_panel_table(spark, sf_dir)
    flat = _tier_row("flat_graph", flat_panel_result_table(spark, sf_dir), gt)
    hnsw = _tier_row("hnsw", hnsw_panel_result_table(spark, sf_dir), gt)
    return flat.unionByName(hnsw)
