"""Wave-39 semantics beyond the oracle hash: Goertzel power equals the
direct DFT bin."""

from __future__ import annotations
import pytest

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave39 import _GZ_FREQ
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _pcm(text: str) -> np.ndarray:
    b = np.array([ord(c) for c in text], dtype=np.int64)
    return np.where(b < 128, b, b - 256).astype(np.float64)


@pytest.mark.slow
def test_goertzel_equals_direct_dft_bin(spark):
    """Goertzel's |s_N|^2 form must equal the textbook
    |sum x_n e^{-i 2 pi f n}|^2 for every document (float tolerance —
    two different summation orders of the same quantity)."""
    res = (
        all_specs()["q_multimodal_goertzel"]
        .fn(spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    for _, r in docs.iterrows():
        x = _pcm(r.text)
        n = np.arange(len(x))
        z = (x * np.exp(-2j * np.pi * _GZ_FREQ * n)).sum()
        power = abs(z) ** 2
        row = res.loc[r.doc_id]
        assert row.n_samples == len(x)
        assert row.energy == int((x.astype(np.int64) ** 2).sum())
        rel = abs(row.goertzel_power - power) / max(power, 1.0)
        assert rel < 1e-6, (r.doc_id, row.goertzel_power, power)


def test_goertzel_detects_a_pure_tone():
    """Sanity of the algorithm itself: a synthetic pure tone at the
    target frequency concentrates (tone_ratio near n/2), a tone at a
    far frequency does not."""
    import math

    from weather_flink_spark.plans.analytics_wave39 import _GZ_C

    def goertzel(xs):
        s1 = s2 = 0.0
        for x in xs:
            s1, s2 = (float(x) + _GZ_C * s1) - s2, s1
        return (s1 * s1 + s2 * s2) - _GZ_C * s1 * s2

    n = 200
    on_tone = [math.cos(2 * math.pi * _GZ_FREQ * t) for t in range(n)]
    off_tone = [math.cos(2 * math.pi * 0.37 * t) for t in range(n)]
    p_on = goertzel(on_tone)
    p_off = goertzel(off_tone)
    assert p_on > 100 * p_off
    # a pure tone's single-bin power ~ (n/2)^2
    assert abs(p_on - (n / 2) ** 2) / (n / 2) ** 2 < 0.05
