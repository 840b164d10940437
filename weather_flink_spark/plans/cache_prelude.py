"""Canonical session-cache prelude (r8 verdict task #5).

``PLAN_METRICS.json`` snapshots the physical plan of every registered
entry, and what a plan PRINTS depends on which shared session caches
(`llm_pipeline._cached`) are registered when it is planned: Spark's
cache manager substitutes an ``InMemoryRelation`` for any matching
logical fragment, so an entry planned BEFORE a shared cache exists
prints the raw build subtree while the same entry planned after
prints a cache boundary. With cache registration happening lazily
inside entry fns, the snapshot depended on registry *insertion order*
— a new early-sorting entry that builds a shared cache could flip
every later consumer's counts (the documented wave-7/round-7 flake
class, SURVEY §15).

This module is the structural fix: ONE pinned prelude that builds
every shared cache, in sorted kind order, before any plan is printed.
``tools/plan_metrics.collect_metrics`` runs it after clearing cache
state, so the snapshot is a pure function of (code, testdata) —
independent of how many entries exist or what their names sort to.

The registry below must cover every ``_cached`` kind in the package;
``unlisted_kinds`` lets callers fail loudly when a new cache is added
without a prelude row (tests/test_plan_metrics.py enforces this on
every full regeneration, so the order-sensitivity class cannot
silently reappear).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession


def _registry_fn(name: str) -> Callable:
    from weather_flink_spark.plans.registry import all_specs

    return all_specs()[name].fn


def prelude_builders() -> dict[str, Callable[[SparkSession, str], object]]:
    """kind -> builder, one row per ``_cached`` kind in the package.

    Builders are the canonical ``*_table`` accessors where one exists;
    result caches owned by a single entry use that entry's registered
    fn. A builder may create several kinds (``_mmr_tables``) — the
    executor dedupes by function identity, and ``_cached`` makes any
    repeat call free anyway.
    """
    from weather_flink_spark.plans import (
        analytics_extra,
        analytics_wave4,
        analytics_wave10,
        analytics_wave13,
        analytics_wave20,
        analytics_wave25,
        analytics_wave26,
        analytics_wave43,
        analytics_wave49,
        analytics_wave56,
        analytics_wave58,
        analytics_wave70,
        analytics_wave74,
        analytics_wave75,
        analytics_wave77,
        analytics_wave78,
        corpus_extra,
        llm_extra,
        llm_pipeline,
        llm_wave5,
    )

    return {
        "b256_result": _registry_fn("q_sim_ann_binary256_rerank"),
        "b256s_result": _registry_fn("q_sim_ann_binary256_sampled_recall"),
        "bands": llm_pipeline.minhash_bands,
        "bigram_lm_counts": _registry_fn("q_text_bigram_lm"),
        "bigram_model": analytics_wave4.bigram_model,
        "bigrams": llm_extra.bigram_table,
        "bq_codes": analytics_wave43.binary_codes_table,
        "bq_result": _registry_fn("q_sim_ann_binary_rerank"),
        "cc_labels": llm_extra._cc_labels,
        "cms_hashed": corpus_extra._cms_hashed,
        "conformal_result": _registry_fn("q_stats_conformal_interval"),
        "cos_buckets": llm_extra._hyperplane_buckets,
        "embtable": llm_pipeline.emb_table,
        "exact_topk": llm_extra.exact_topk_table,
        "exact_topk_panel": analytics_wave56.exact_topk_panel_table,
        "flat_result_panel": analytics_wave58.flat_panel_result_table,
        "graph_ann_result": _registry_fn("q_sim_ann_graph"),
        "graph_entries": analytics_wave20.graph_entry_nodes,
        "hnsw_l0_xcell": analytics_wave26.l0_xcell_edges_table,
        "hnsw_l1_edges": analytics_wave26.l1_edges_table,
        "hnsw_l1_medoids": analytics_wave26.l1_medoids_table,
        "hnsw_l1_nodes": analytics_wave26.l1_nodes_table,
        "hnsw_result": _registry_fn("q_sim_ann_hnsw"),
        "hnsw_result_panel": analytics_wave58.hnsw_panel_result_table,
        "ivf_assigned": llm_extra.ivf_assigned_table,
        "ivfpq_ann_result": _registry_fn("q_sim_ann_ivfpq"),
        "ivfpq_refined_ann_result": _registry_fn("q_sim_ann_ivfpq_refined"),
        "ivfpq_refined_result_panel": (
            analytics_wave74.ivfpq_refined_panel_result_table
        ),
        "opq_refined_ann_result": _registry_fn("q_sim_ann_opq_refined"),
        "opq_refined_result_panel": (
            analytics_wave74.opq_refined_panel_result_table
        ),
        "ivfpq_result_panel": analytics_wave70.ivfpq_panel_result_table,
        "kmeans_final": analytics_wave4.kmeans_final_assignment,
        "knn_edges": analytics_wave20.knn_edges_table,
        "mh_sig_full": _registry_fn("q_dedup_minhash_accuracy"),
        "mmr_cand": analytics_wave10._mmr_tables,
        "mmr_pair": analytics_wave10._mmr_tables,
        "name_dict": llm_extra.name_dict_table,
        "opq_codes": analytics_wave25.opq_codes_table,
        "opq_rotated": analytics_wave25.opq_rotated_table,
        "order_part_edges": analytics_wave4.order_part_edges_table,
        "pairs": llm_pipeline.near_dup_pairs,
        "panel_rows_bin": _registry_fn("q_sim_recall_panel"),
        "panel_rows_pq": _registry_fn("q_sim_recall_panel_pq"),
        "panel_rows_pq8": _registry_fn("q_sim_recall_panel_pq8"),
        "ivfpq8_refined_ann_result": _registry_fn("q_sim_ann_ivfpq8_refined"),
        "ivfpq8_refined_result_panel": (
            analytics_wave77.ivfpq8_refined_panel_result_table
        ),
        "pca_power_model": llm_wave5.pca_power_model,
        "pq8_codes": analytics_wave77.pq8_codes_table,
        "pq_codes": analytics_wave13.pq_codes_table,
        "pr_graph": analytics_extra._pr_graph,
        "rowgroup_layout": analytics_wave75.rowgroup_layout_and_manifest,
        "rowgroup_zorder_layout": analytics_wave78.zorder_layout_and_manifest,
        "shingles": llm_pipeline.shingle_table,
        "simhash": llm_extra.simhash_table,
        "split_assigned": _registry_fn("q_split_leakage_check"),
        "thermo_codes": analytics_wave49.thermo_codes_table,
        "thermo_codes_s": analytics_wave49.thermo_codes_sampled_table,
        "thermo_thr": analytics_wave49.thermo_thresholds_table,
        "thermo_thr_s": analytics_wave49.thermo_thresholds_sampled_table,
    }


def build_all_caches(spark: SparkSession, sf_dir: str) -> int:
    """Build every shared cache in sorted kind order; returns the
    number of distinct builders invoked."""
    builders = prelude_builders()
    seen: set[int] = set()
    n = 0
    for kind in sorted(builders):
        fn = builders[kind]
        if id(fn) in seen:
            continue
        seen.add(id(fn))
        fn(spark, sf_dir)
        n += 1
    return n


def unlisted_kinds() -> list[str]:
    """``_cached`` kinds present in the live session cache that have
    no prelude row — each one is a latent insertion-order dependency
    for the plan snapshot."""
    from weather_flink_spark.plans.llm_pipeline import _SIG_CACHE

    listed = set(prelude_builders())
    return sorted({k for (k, _, _) in _SIG_CACHE if k not in listed})
