"""t-digest sketch: determinism, mergeability, rank-error bound."""

from __future__ import annotations

import numpy as np

from weather_flink_spark.plans.registry import all_specs
from weather_flink_spark.operators.tdigest import compress, estimate

SF = "/root/testdata/sf0.001"


def _rank_err(values: np.ndarray, est: float, q: float) -> float:
    return abs((values <= est).mean() - q)


def test_compress_deterministic_and_bounded():
    rng = np.random.default_rng(7)
    v = rng.lognormal(3.0, 1.0, size=20_000)
    m1, w1 = compress(v, np.ones_like(v), 200.0)
    m2, w2 = compress(v, np.ones_like(v), 200.0)
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
    assert len(m1) <= 2 * 200  # O(delta) centroids
    assert w1.sum() == len(v)  # no mass lost
    assert np.all(np.diff(m1) >= 0)  # means stay sorted
    for q in (0.01, 0.5, 0.9, 0.99, 0.999):
        (est,) = estimate(m1, w1, [q])
        assert _rank_err(v, est, q) <= 0.01, q


def test_merge_of_parts_matches_whole():
    rng = np.random.default_rng(11)
    v = rng.normal(100.0, 25.0, size=30_000)
    whole_m, whole_w = compress(v, np.ones_like(v), 200.0)
    parts = [compress(c, np.ones_like(c), 200.0) for c in np.array_split(v, 30)]
    merged_m, merged_w = compress(
        np.concatenate([m for m, _ in parts]),
        np.concatenate([w for _, w in parts]),
        200.0,
    )
    assert merged_w.sum() == len(v)
    for q in (0.5, 0.9, 0.99):
        (e_whole,) = estimate(whole_m, whole_w, [q])
        (e_merged,) = estimate(merged_m, merged_w, [q])
        exact = np.quantile(v, q)
        assert _rank_err(v, e_merged, q) <= 0.01
        # merged and whole-data digests agree with each other and exact
        span = v.max() - v.min()
        assert abs(e_whole - e_merged) <= 0.02 * span
        assert abs(e_merged - exact) <= 0.02 * span


def test_tdigest_query_rank_error(spark):
    rows = (
        all_specs()["q_agg_tdigest_mergeable"]
        .fn(spark, SF)
        .collect()
    )
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["within_2pct_rank"], r
        by_type.setdefault(r["event_type"], []).append((r["q"], r["exact_v"]))
    for pairs in by_type.values():
        pairs.sort()
        vals = [v for _, v in pairs]
        assert vals == sorted(vals), "exact percentiles must be monotone in q"
