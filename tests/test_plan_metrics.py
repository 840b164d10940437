"""The deterministic perf gate (round-7 verdict task #1).

Regenerates physical-plan node-type counts for every registered batch
query at sf0.001 and compares them to the committed PLAN_METRICS.json.
ANY drift fails: regressions (added shuffle, broadcast->SMJ flip, new
Python eval node) are labeled as such; improvements fail too so they
are re-committed deliberately via `python tools/plan_metrics.py
--update`. Structure is deterministic where wall-clock is not — this
replaces the sf0.1 wall-clock suite as the primary regression gate
(BASELINE.md; wall-clock is demoted to a sanity band checked by
tools/bench_budget.py).
"""

from __future__ import annotations
import pytest

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from plan_metrics import (  # noqa: E402
    SNAPSHOT_PATH,
    collect_metrics,
    diff_metrics,
)

# session confs the plan shapes depend on; pin them in case an earlier
# test in the shared session changed one
_PINNED_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024) + "b",
    "spark.sql.shuffle.partitions": "32",
}


@pytest.mark.slow
def test_plan_metrics_snapshot(spark, sf_dir):
    saved = {k: spark.conf.get(k) for k in _PINNED_CONFS}
    for k, v in _PINNED_CONFS.items():
        spark.conf.set(k, v)
    try:
        current = collect_metrics(spark, sf_dir)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    committed = json.loads(SNAPSHOT_PATH.read_text())
    regressions, drift = diff_metrics(committed, current)
    msg = "\n".join(regressions + drift)
    assert not regressions, (
        "structural plan REGRESSIONS vs committed PLAN_METRICS.json "
        "(added shuffle / join-strategy downgrade / new Python eval):\n"
        + msg
    )
    assert not drift, (
        "plan structure drifted from committed PLAN_METRICS.json — if "
        "intentional, run `python tools/plan_metrics.py --update`, "
        "review the diff, and commit it:\n" + msg
    )


@pytest.mark.slow
def test_snapshot_is_insertion_order_free(spark, sf_dir):
    """r8 verdict task #5 done-bar: register a SYNTHETIC entry that
    sorts before everything ('a_...') and eagerly MATERIALIZES shared
    session caches from inside its fn — exactly the drift class that
    used to flip later consumers' cache substitution — then re-collect
    a subset of heavy cache consumers and require zero diffs vs the
    same collection without the synthetic entry."""
    from pyspark.sql import functions as F

    from weather_flink_spark.plans.registry import _REGISTRY, register

    probes = {
        "q_emb_knn_label_accuracy",   # composes knn_edges
        "q_dedup_semantic_ivf",       # composes ivf_assigned + kmeans
        "q_sim_ann_hnsw_recall",      # composes the whole hnsw stack
        "q_text_perplexity_bigram",   # composes bigram_model
    }
    base = collect_metrics(spark, sf_dir, names=probes)

    @register("a_00_synthetic_cache_builder")
    def _synthetic(spark, sf_dir):
        from weather_flink_spark.plans.analytics_wave20 import (
            knn_edges_table,
        )
        from weather_flink_spark.plans.llm_pipeline import minhash_bands

        # materialize (not just register) two shared caches
        knn_edges_table(spark, sf_dir).count()
        minhash_bands(spark, sf_dir).count()
        return spark.range(1).select(F.lit(1).alias("ok"))

    try:
        again = collect_metrics(
            spark, sf_dir, names=probes | {"a_00_synthetic_cache_builder"}
        )
    finally:
        _REGISTRY.pop("a_00_synthetic_cache_builder", None)

    regressions, drift = diff_metrics(
        base, {k: v for k, v in again.items() if k in probes}
    )
    assert not regressions and not drift, regressions + drift
