"""Wave-54: DTW python twin + warp identities, Haar perfect
reconstruction, ROUGE score properties."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from weather_flink_spark.plans import analytics_wave54 as w54
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _profiles():
    """(user -> per-mille profile, reference profile) replayed in
    python from the raw parquet with the plan's exact rules."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, hour(ts) // 3 AS b, COUNT(*) AS c
        FROM read_parquet('{SF}/events.parquet') events
        GROUP BY 1, 2
        """
    ).fetchall()
    cnt: dict[int, list[int]] = {}
    for u, b, c in rows:
        cnt.setdefault(u, [0] * 8)[b] += c
    prof = {
        u: [(1000 * c) // sum(cs) for c in cs] for u, cs in cnt.items()
    }
    g = [0] * 8
    for cs in cnt.values():
        for k in range(8):
            g[k] += cs[k]
    ref = [(1000 * c) // sum(g) for c in g]
    return prof, ref


def _dtw(a: list[int], b: list[int]) -> int:
    n = len(a)
    D = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            cost = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i][j] = cost
            elif i == 0:
                D[i][j] = D[i][j - 1] + cost
            elif j == 0:
                D[i][j] = D[i - 1][j] + cost
            else:
                D[i][j] = min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]) + cost
    return D[n - 1][n - 1]


def test_dtw_matches_python_dp_and_warp_identities(spark):
    got = {r.user_id: r for r in all_specs()["q_ts_dtw_profile"].fn(spark, SF).collect()}
    prof, ref = _profiles()
    assert set(got) == set(prof)
    for u, p in prof.items():
        r = got[u]
        assert r.dtw_pm == _dtw(p, ref), u
        assert r.l1_pm == sum(abs(x - y) for x, y in zip(p, ref))
        assert r.warp_gain == r.l1_pm - r.dtw_pm
        assert r.warp_gain >= 0  # warping can only help
    # the fixture actually exercises warping somewhere
    assert any(r.warp_gain > 0 for r in got.values())


def test_haar_perfect_reconstruction(spark):
    got = {r.user_id: r for r in all_specs()["q_events_haar_dwt"].fn(spark, SF).collect()}
    prof, _ = _profiles()
    for u, p in prof.items():
        r = got[u]
        # inverse butterflies: level 3 -> 2 -> 1 -> profile
        a2 = [(r.a3 + r.d3) // 2, (r.a3 - r.d3) // 2]
        d2 = [r.d2_0, r.d2_1]
        a1 = []
        for k in range(2):
            a1 += [(a2[k] + d2[k]) // 2, (a2[k] - d2[k]) // 2]
        d1 = [r.d1_0, r.d1_1, r.d1_2, r.d1_3]
        back = []
        for k in range(4):
            back += [(a1[k] + d1[k]) // 2, (a1[k] - d1[k]) // 2]
        assert back == p, u
        assert r.detail_energy == sum(abs(d) for d in d1) + sum(
            abs(d) for d in d2
        ) + abs(r.d3)
        assert r.a3 == sum(p)  # DC coefficient = profile mass


def test_rouge_pairs_are_banded_and_bounded(spark):
    rows = all_specs()["q_text_rouge_pairs"].fn(spark, SF).collect()
    assert rows  # the corpus has near-dup structure
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 <= r.rouge1_recall <= 1.0
        if r.rouge2_recall is not None:
            assert 0.0 <= r.rouge2_recall <= 1.0
    # high unigram recall pairs exist (that's why banding proposed them)
    assert any(r.rouge1_recall >= 0.5 for r in rows)
