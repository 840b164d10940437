"""Wave-66: video shot-boundary detection."""

from __future__ import annotations
import pytest

import pandas as pd

from weather_flink_spark.plans.analytics_wave66 import _FRAME, _K
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _python_shots(text: str) -> tuple[int, int, int]:
    b = text.encode("utf-8")
    n = len(b) // _FRAME
    intens = [
        sum(b[k * _FRAME : (k + 1) * _FRAME]) for k in range(n)
    ]
    ads = [abs(intens[i] - intens[i - 1]) for i in range(1, n)]
    s = sum(ads)
    nb = sum(1 for a in ads if a * len(ads) > _K * s)
    return n, nb, max(ads, default=0)


@pytest.mark.slow
def test_shot_summary_matches_python_replay(spark):
    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_shot_boundaries"].fn(spark, SF).collect()
    }
    d = pd.read_parquet(f"{SF}/documents.parquet")
    n_with_frames = 0
    for rec in d.itertuples():
        n, nb, mx = _python_shots(rec.text)
        if n == 0:
            assert rec.doc_id not in rows
            continue
        n_with_frames += 1
        r = rows[rec.doc_id]
        assert (r.n_frames, r.n_boundaries, r.max_abs_delta) == (n, nb, mx)
        assert r.n_shots == nb + 1
    assert len(rows) == n_with_frames
    # the detector fires somewhere on the corpus, and not everywhere
    total_b = sum(r.n_boundaries for r in rows.values())
    assert 0 < total_b < len(rows)


def test_single_frame_clip_is_one_shot():
    """A clip too short for any delta is one shot with zero
    boundaries (pure kernel property via the python replay)."""
    n, nb, mx = _python_shots("x" * _FRAME)
    assert (n, nb, mx) == (1, 0, 0)
    # constant clip: deltas exist but are all zero -> no boundary
    n, nb, mx = _python_shots("a" * (_FRAME * 4))
    assert (n, nb, mx) == (4, 0, 0)
