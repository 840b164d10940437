"""Wave-46: Kleinberg burst detection + spectral centroid twins."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from weather_flink_spark.plans import analytics_wave46 as w46
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_burst_kleinberg_matches_python_twin(spark):
    rows = all_specs()["q_events_burst_kleinberg"].fn(spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    series: dict[int, list[int]] = {}
    for u, t in ev:
        series.setdefault(u, []).append(t)
    want = {}
    for u, ts in series.items():
        n = len(ts)
        if n < w46._BURST_MIN_EVENTS or ts[-1] <= ts[0]:
            continue
        lam0 = (float(n - 1) * 1e6) / float(ts[-1] - ts[0])
        t_pen = round(w46._BURST_GAMMA * math.log(float(n)), 9)
        d, nb, ne, prev = w46._D0, 0, 0, False
        for i in range(1, n):
            g = float(ts[i] - ts[i - 1]) / 1e6
            d = (min(t_pen, d) - min(0.0, d)) + (lam0 * g - w46._LN_S)
            if d < 0:
                nb += 1
                ne += 0 if prev else 1
                prev = True
            else:
                prev = False
        want[u] = (n, round(lam0, 9), nb, ne)
    got = {r.user_id: (r.n_events, r.lambda0, r.n_burst_events, r.n_episodes) for r in rows}
    assert got == want


def test_burst_kleinberg_detects_synthetic_burst(spark):
    """Semantic check on a constructed series: 20 slow events then a
    tight burst of 10 — the burst suffix must flag, the slow prefix
    must not (prefix-only series: zero episodes)."""
    import pandas as pd

    slow = [i * 100_000_000 for i in range(20)]  # one per 100 s
    burst = [slow[-1] + 1_000_000 * (i + 1) for i in range(10)]  # per 1 s

    def run(ts_us: list[int]) -> tuple[int, int]:
        n = len(ts_us)
        lam0 = (float(n - 1) * 1e6) / float(ts_us[-1] - ts_us[0])
        t_pen = round(w46._BURST_GAMMA * math.log(float(n)), 9)
        d, nb, ne, prev = w46._D0, 0, 0, False
        for i in range(1, n):
            g = float(ts_us[i] - ts_us[i - 1]) / 1e6
            d = (min(t_pen, d) - min(0.0, d)) + (lam0 * g - w46._LN_S)
            if d < 0:
                nb += 1
                ne += 0 if prev else 1
                prev = True
            else:
                prev = False
        return nb, ne

    nb_full, ne_full = run(slow + burst)
    nb_slow, ne_slow = run(slow)
    assert nb_slow == 0 and ne_slow == 0
    # the entry cost gamma*ln(n) amortizes over the first ~5 tight
    # gaps (correct Kleinberg hysteresis), then the tail stays in
    # burst: one episode covering the late burst events
    assert nb_full >= 4 and ne_full == 1


def test_spectral_centroid_matches_numpy_dft(spark):
    """The Goertzel bin powers must equal |DFT bin|^2 computed by a
    straight numpy complex sum, and the centroid must lie inside the
    bin frequency range."""
    rows = all_specs()["q_multimodal_spectral_centroid"].fn(spark, SF).collect()
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    checked = 0
    for r in rows[:25]:
        xs = np.array(
            [(b if b < 128 else b - 256) for b in map(ord, docs[r.doc_id])],
            dtype=np.float64,
        )
        nn = len(xs)
        assert r.n_samples == nn
        t = np.arange(nn)
        for k, got in ((1, r.p1), (2, r.p2), (3, r.p3), (4, r.p4)):
            w = 2.0 * np.pi * k / 16.0
            s = np.sum(xs * np.exp(-1j * w * t))
            want = float(np.abs(s) ** 2)
            assert abs(got - want) <= 1e-4 * max(1.0, abs(want)), (r.doc_id, k)
        if r.centroid is not None:
            assert 1 / 16 - 1e-9 <= r.centroid <= 4 / 16 + 1e-9
        checked += 1
    assert checked == 25
