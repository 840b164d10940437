"""Wave-59: DCT perceptual hash (pHash) — the third image-dedup tier."""

from __future__ import annotations

from weather_flink_spark.operators.multimodal import (
    PHASH_COS_SCALE,
    bmp_encode,
    bmp_phash,
    phash_cos_table,
)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _gray_source(width: int, height: int, vals: list[int]) -> bytes:
    """Exact-stride grayscale pixel source: pixel j's three channel
    bytes all equal vals[j]."""
    stride = ((width * 3 + 3) // 4) * 4
    buf = bytearray(height * stride)
    for j in range(width * height):
        p = (j // width) * stride + (j % width) * 3
        buf[p : p + 3] = bytes([vals[j]] * 3)
    return bytes(buf)


def test_phash_matches_independent_matrix_dct_replay():
    """The loop kernel must agree with an independent numpy replay:
    coefficients = Ch @ G @ Cw^T over the same quantized basis, bits =
    AC coefficients strictly above the lower median."""
    import random

    import numpy as np

    rng = random.Random(3)
    for _ in range(25):
        w, h = rng.randint(4, 8), rng.randint(2, 5)
        vals = [rng.randint(0, 255) for _ in range(w * h)]
        got = bmp_phash(bmp_encode(w, h, _gray_source(w, h, vals)))
        assert got is not None and (got[0], got[1]) == (w, h)
        grid = 3 * np.array(vals, dtype=object).reshape(h, w)
        ch = np.array(phash_cos_table(h), dtype=object)
        cw = np.array(phash_cos_table(w), dtype=object)
        coeff = ch @ grid @ cw.T  # exact ints (object dtype)
        ac = [
            (u * w + v - 1, int(coeff[u][v]))
            for u in range(h)
            for v in range(w)
            if (u, v) != (0, 0)
        ]
        med = sorted(d for _, d in ac)[(len(ac) - 1) // 2]
        expect = sum(1 << b for b, d in ac if d > med)
        assert got[2] == expect


def test_phash_is_brightness_shift_invariant_and_deterministic():
    """Every u>0 row of the quantized basis sums to EXACTLY 0 (the
    cosine symmetry survives rounding), so adding a constant to every
    pixel moves only the DC coefficient — the hash is exactly
    invariant to uniform brightness shifts, the failure mode that
    flips ahash/dhash bit patterns built from raw byte levels."""
    for n in range(2, 9):
        tab = phash_cos_table(n)
        assert tab[0] == [PHASH_COS_SCALE] * n
        for u in range(1, n):
            assert sum(tab[u]) == 0
    import random

    rng = random.Random(7)
    for _ in range(20):
        w, h = rng.randint(4, 8), rng.randint(2, 5)
        vals = [rng.randint(0, 200) for _ in range(w * h)]
        b1 = bmp_encode(w, h, _gray_source(w, h, vals))
        b2 = bmp_encode(w, h, _gray_source(w, h, [v + 40 for v in vals]))
        assert bmp_phash(b1) == bmp_phash(b1)  # deterministic
        assert bmp_phash(b1)[2] == bmp_phash(b2)[2]
    assert bmp_phash(b"not a bmp") is None


def test_phash_entry_verdicts_are_symmetric_and_thresholded(spark):
    from weather_flink_spark.plans import analytics_wave52 as w52

    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_image_dedup_phash"].fn(spark, SF).collect()
    }
    assert len(rows) == 500
    hashes = {d: (r.width, r.height, r.phash) for d, r in rows.items()}
    n_matched = 0
    for d, r in rows.items():
        if r.best_match_id is not None:
            n_matched += 1
            pw, ph, pa = hashes[r.best_match_id]
            assert (pw, ph) == (r.width, r.height)
            assert bin(pa ^ r.phash).count("1") == r.best_hamming
            assert r.best_hamming <= w52._AHASH_T
            assert rows[r.best_match_id].n_neardups >= 1
        else:
            assert r.n_neardups == 0
    assert n_matched > 0


def test_phash_is_the_precision_tier(spark):
    """Measured role on the fixtures: phash is the SELECTIVE tier —
    it flags far fewer docs than either byte-level tier (137 vs
    243/292 at sf0.001), mostly the cross-tier intersection (133 of
    137 in all three), i.e. frequency-confirmed near-dups, while still
    contributing pairwise gains (docs ahash alone misses, docs dhash
    alone misses). A curation pipeline uses it to CONFIRM (high
    n_tiers_flagging routes to auto-drop) rather than to widen
    recall."""

    def matched(key):
        rows = all_specs()[key].fn(spark, SF).collect()
        return {r.doc_id for r in rows if r.best_match_id is not None}

    a = matched("q_multimodal_image_dedup_ahash")
    d = matched("q_multimodal_image_dedup_dhash")
    p = matched("q_multimodal_image_dedup_phash")
    assert p, "phash flags nothing"
    assert len(p) < min(len(a), len(d))  # most selective tier
    assert p - a, "phash adds nothing over ahash alone"
    assert p - d, "phash adds nothing over dhash alone"
    # overwhelmingly frequency-CONFIRMED matches, not a recall widener
    assert len(p & a & d) / len(p) > 0.9
