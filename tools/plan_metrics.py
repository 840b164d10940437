"""Deterministic physical-plan metrics snapshot (round-7 verdict task #1).

Wall-clock at sf0.1 cost rounds 4-6 a verdict task each, re-adjudicating
a ±10-31 s ambient band. Plan STRUCTURE is deterministic where
wall-clock is not, and it is exactly the "is this the plan you'd want
at 100x" signal: an added shuffle, a broadcast->SortMergeJoin flip, or
a Python eval node sneaking into a hot path shows up here as a diff,
on every machine, every run.

For every registered BATCH query at sf0.001 this tool plans the final
DataFrame without collecting it (entry fns themselves may still
materialize session caches or write fixtures — e.g. cached-table
count()/persist() builds, q_layout_compact_optimize's parquet
rewrite — so a run does real I/O even though the returned frame is
only planned) and counts physical node types into
``PLAN_METRICS.json``: ``{entry: {node_kind: count, ...}}``. Node
COUNTS only — no expression IDs, partition numbers, or file paths, so
the snapshot is stable across sessions. Streaming ``s_*`` entries are
excluded: their registry fns RUN a micro-batch stream and return its
materialized sink, whose batch plan is a fixture scan, not the
streaming topology.

tests/test_plan_metrics.py regenerates the metrics and fails on ANY
drift from the committed snapshot — regressions (exchange added, SMJ
appeared, UDF introduced) are called out as such; improvements still
fail so they get re-committed deliberately:

    python tools/plan_metrics.py --update    # accept current plans
    python tools/plan_metrics.py             # check against committed

Caching note (r9, verdict task #5): determinism against shared session
caches comes from TWO mechanisms — (a) the canonical cache prelude
(plans/cache_prelude.build_all_caches) registers every shared cache
before any plan is printed, so substitution never depends on which
entries exist or how their names sort; (b) counts come from traversing
the JVM plan tree (extract_df), where InMemoryTableScan is a leaf, so
a MATERIALIZED cache's executed-build dump (whose AQE sections defeat
text indentation heuristics) can never leak into the counts.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SNAPSHOT_PATH = REPO / "PLAN_METRICS.json"
SF_DIR = "/root/testdata/sf0.001"

# node kind -> regex over the physical plan string. Word boundaries keep
# "Exchange" from matching inside "BroadcastExchange"/"ReusedExchange"
# and "Sort" from matching inside "SortMergeJoin"/"SortAggregate".
NODE_PATTERNS: dict[str, str] = {
    "shuffle_exchange": r"\bExchange\b",
    "broadcast_exchange": r"\bBroadcastExchange\b",
    "reused_exchange": r"\bReusedExchange\b",
    "sort_merge_join": r"\bSortMergeJoin\b",
    "broadcast_hash_join": r"\bBroadcastHashJoin\b",
    "shuffled_hash_join": r"\bShuffledHashJoin\b",
    "broadcast_nested_loop_join": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_product": r"\bCartesianProduct\b",
    "sort": r"\bSort\b",
    "window": r"\bWindow\b",
    "window_group_limit": r"\bWindowGroupLimit\b",
    "python_batch_eval": r"\bBatchEvalPython\b",
    "python_arrow_eval": r"\bArrowEvalPython\b",
    "apply_in_pandas": r"\bFlatMapGroupsInPandas\b",
    "cogroup_in_pandas": r"\bFlatMapCoGroupsInPandas\b",
    "map_in_pandas": r"\bMapInPandas\b",
    "agg_in_pandas": r"\bAggregateInPandas\b",
    "in_memory_scan": r"\bInMemoryTableScan\b",
    "parquet_scan": r"\bFileScan parquet\b|\bScan parquet\b",
    "take_ordered": r"\bTakeOrderedAndProject\b",
    "generate": r"\bGenerate\b",
    "global_limit": r"\bGlobalLimit\b",
}

# kinds whose INCREASE is a structural regression by definition
REGRESSION_KINDS = (
    "shuffle_exchange",
    "sort_merge_join",
    "shuffled_hash_join",
    "broadcast_nested_loop_join",
    "cartesian_product",
    "python_batch_eval",
    "python_arrow_eval",
    "apply_in_pandas",
    "cogroup_in_pandas",
    "map_in_pandas",
    "agg_in_pandas",
    "sort",
)


def extract_df(df) -> dict[str, int]:
    """Node-kind counts by TRAVERSING the JVM physical-plan tree.

    Replaces text parsing of ``sparkPlan().toString()`` (r9): a
    MATERIALIZED ``InMemoryRelation`` prints its executed build as an
    ``AdaptiveSparkPlan`` dump whose ``== Final Plan ==`` sections
    reset indentation, defeating any depth-heuristic strip and
    leaking the cached build's nodes into the counts — which made
    counts depend on whether another entry had already run the cache
    (the insertion-order flake the cache prelude exists to kill). In
    the traversed tree ``InMemoryTableScan`` is a LEAF (the cached
    relation is metadata, not a child), so what's behind the cache
    boundary can never leak, materialized or not. Each node's
    ``simpleString`` is matched against the same NODE_PATTERNS as the
    old text lines. ``codegen_spans`` disappears with the text path —
    sparkPlan() is pre-codegen, so every ``*(n)`` marker the old
    counts saw came from leaked executed-cache dumps (a bug, not a
    signal)."""
    out: dict[str, int] = {}
    stack = [df._jdf.queryExecution().sparkPlan()]
    while stack:
        node = stack.pop()
        line = node.simpleString(1000)
        for kind, pat in NODE_PATTERNS.items():
            if re.search(pat, line):
                out[kind] = out.get(kind, 0) + 1
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))
    return out


def collect_metrics(spark, sf_dir: str = SF_DIR, names=None) -> dict[str, dict[str, int]]:
    """Collect node-type counts for every batch entry.

    Starts from a PRISTINE cache state (clearCache + _SIG_CACHE
    reset), then runs the CANONICAL CACHE PRELUDE
    (plans/cache_prelude.build_all_caches — every shared session
    cache built in sorted kind order) before any plan is printed, so
    each entry is planned against the SAME fully-registered cache
    state regardless of how many entries exist or what their names
    sort to (r8 verdict task #5 — previously a new early-sorting
    entry that built a shared cache flipped later consumers' cache
    substitution). With state pinned by the prelude instead of the
    walk, a subset request plans only the requested entries.
    Callers' caches rebuild lazily afterwards.
    """
    from weather_flink_spark.plans import llm_pipeline
    from weather_flink_spark.plans.cache_prelude import (
        build_all_caches,
        unlisted_kinds,
    )
    from weather_flink_spark.plans.registry import all_specs

    spark.catalog.clearCache()
    llm_pipeline._SIG_CACHE.clear()
    build_all_caches(spark, sf_dir)
    specs = all_specs()
    out: dict[str, dict[str, int]] = {}
    # Capture plans with snapshots DISABLED (r11 verdict #4/#6): a
    # materialized localCheckpoint starts the captured plan at "Scan
    # ExistingRDD", hiding everything upstream of it from the
    # regression gate — q_graph_label_propagation's row was {}. With
    # WFS_NO_SNAPSHOT=1 every snapshot site is a no-op, so the FULL
    # logical topology is what gets counted. Only planning happens
    # here (no action on the entry frame), so the exponential
    # re-execution the snapshots prevent at runtime never runs; the
    # session caches above were built in normal mode and hide behind
    # InMemoryTableScan leaves either way.
    import os as _os

    prev = _os.environ.get("WFS_NO_SNAPSHOT")
    _os.environ["WFS_NO_SNAPSHOT"] = "1"
    try:
        for name in sorted(specs):
            if name.startswith("s_"):
                continue
            if names and name not in names:
                continue
            df = specs[name].fn(spark, sf_dir)
            out[name] = extract_df(df)
    finally:
        if prev is None:
            _os.environ.pop("WFS_NO_SNAPSHOT", None)
        else:
            _os.environ["WFS_NO_SNAPSHOT"] = prev
    missing = unlisted_kinds()
    if missing:
        raise RuntimeError(
            "cache kinds with no prelude row (latent insertion-order "
            f"dependency for the plan snapshot): {missing} — add them "
            "to weather_flink_spark/plans/cache_prelude.py"
        )
    return out


def diff_metrics(
    committed: dict[str, dict[str, int]], current: dict[str, dict[str, int]]
) -> tuple[list[str], list[str]]:
    """Returns (regressions, other_drift) as human-readable lines."""
    regressions: list[str] = []
    drift: list[str] = []
    for name in sorted(set(committed) | set(current)):
        old, new = committed.get(name), current.get(name)
        if old is None:
            drift.append(f"{name}: NEW entry (no committed snapshot)")
            continue
        if new is None:
            drift.append(f"{name}: entry REMOVED from registry")
            continue
        if old == new:
            continue
        for kind in sorted(set(old) | set(new)):
            o, n = old.get(kind, 0), new.get(kind, 0)
            if o == n:
                continue
            line = f"{name}: {kind} {o} -> {n}"
            if kind in REGRESSION_KINDS and n > o:
                regressions.append("REGRESSION " + line)
            else:
                drift.append(line)
    return regressions, drift


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from weather_flink_spark.session import get_spark

    spark = get_spark("plan-metrics")
    current = collect_metrics(spark, args.sf, args.names or None)

    if args.update:
        if args.names:  # partial update: merge into the committed snapshot
            merged = json.loads(SNAPSHOT_PATH.read_text()) if SNAPSHOT_PATH.exists() else {}
            merged.update(current)
            current = dict(sorted(merged.items()))
        SNAPSHOT_PATH.write_text(json.dumps(current, indent=1, sort_keys=True) + "\n")
        print(f"wrote {SNAPSHOT_PATH.name}: {len(current)} entries")
        return

    committed = json.loads(SNAPSHOT_PATH.read_text())
    if args.names:
        committed = {k: v for k, v in committed.items() if k in current}
    regressions, drift = diff_metrics(committed, current)
    for line in regressions + drift:
        print(line)
    print(
        f"{len(current)} entries checked: {len(regressions)} regressions, "
        f"{len(drift)} other drift"
    )
    sys.exit(1 if (regressions or drift) else 0)


if __name__ == "__main__":
    main()
