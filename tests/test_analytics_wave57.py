"""Wave-57: audio near-dedup via the energy-gradient hash."""

from __future__ import annotations
import pytest

from weather_flink_spark.operators.multimodal import (
    EHASH_N_FRAMES,
    wav_encode,
    wav_energyhash,
)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_energyhash_gradient_rule_and_determinism():
    """A rising staircase sets every gradient bit; a falling one sets
    none; identical clips hash identically; corrupt bytes -> None."""
    n = EHASH_N_FRAMES * 4  # 4 samples per frame
    rising = bytes(min(255, i * 2) for i in range(n))
    falling = bytes(reversed(rising))
    r = wav_energyhash(wav_encode(8000, rising))
    f = wav_energyhash(wav_encode(8000, falling))
    assert r is not None and f is not None
    assert r[0] == 8000 and r[1] == n
    assert r[2] == (1 << (EHASH_N_FRAMES - 1)) - 1  # all 32 bits set
    assert f[2] == 0
    assert wav_energyhash(wav_encode(8000, rising)) == r
    assert wav_energyhash(b"not a wav") is None


def test_energyhash_is_level_shift_robust():
    """Adding a constant DC offset to every sample preserves every
    gradient bit — the property that makes this a NEAR-dup key."""
    n = EHASH_N_FRAMES * 3
    base = bytes((i * 7) % 180 for i in range(n))
    shifted = bytes(b + 40 for b in base)
    h1 = wav_energyhash(wav_encode(12000, base))
    h2 = wav_energyhash(wav_encode(12000, shifted))
    assert h1 is not None and h2 is not None
    assert h1[2] == h2[2]


def test_entry_verdicts_are_symmetric_and_blocked(spark):
    """Every matched clip's partner is matched back; partners always
    share a sample_rate (the block key); hash fits in 32 bits."""
    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_audio_dedup_energyhash"]
        .fn(spark, SF)
        .collect()
    }
    assert len(rows) == 500  # one row per document, always
    matched = {d: r for d, r in rows.items() if r.best_match_id is not None}
    assert matched, "fixture should contain at least one audio near-dup"
    for d, r in matched.items():
        assert 0 <= r.ehash < (1 << (EHASH_N_FRAMES - 1))
        p = rows[r.best_match_id]
        assert p.best_match_id is not None  # symmetric verdict
        assert p.sample_rate == r.sample_rate  # block key shared
        assert r.n_neardups >= 1


@pytest.mark.slow
def test_union_verdict_counts_are_consistent(spark):
    """The union entry's flags must equal the tiers' own verdicts and
    the count must be their sum; the union strictly out-flags any
    single tier on the fixture."""
    rows = {r.doc_id: r for r in all_specs()["q_multimodal_dedup_union"].fn(spark, SF).collect()}
    assert len(rows) == 500
    ah = {r.doc_id for r in all_specs()["q_multimodal_image_dedup_ahash"].fn(spark, SF).collect() if r.best_match_id is not None}
    dh = {r.doc_id for r in all_specs()["q_multimodal_image_dedup_dhash"].fn(spark, SF).collect() if r.best_match_id is not None}
    phh = {r.doc_id for r in all_specs()["q_multimodal_image_dedup_phash"].fn(spark, SF).collect() if r.best_match_id is not None}
    au = {r.doc_id for r in all_specs()["q_multimodal_audio_dedup_energyhash"].fn(spark, SF).collect() if r.best_match_id is not None}
    for d, r in rows.items():
        assert r.image_ahash_hit == (d in ah)
        assert r.image_dhash_hit == (d in dh)
        assert r.image_phash_hit == (d in phh)
        assert r.audio_hit == (d in au)
        assert r.n_tiers_flagging == int(d in ah) + int(d in dh) + int(
            d in phh
        ) + int(d in au)
    flagged = {d for d, r in rows.items() if r.n_tiers_flagging > 0}
    assert len(flagged) > max(len(ah), len(dh), len(phh), len(au))
