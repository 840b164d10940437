"""Wave-52: perceptual image dedup — codec-level hash properties and
the banding pigeonhole guarantee."""

from __future__ import annotations

from weather_flink_spark.operators.multimodal import bmp_ahash, bmp_encode
from weather_flink_spark.plans import analytics_wave52 as w52
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _bimodal_source(width: int, height: int, bright: set[int]) -> bytes:
    """Exact-stride pixel source (no cycling drift): pixel j is bright
    (240,240,240) iff j in ``bright``, else dark (10,10,10) — every
    intensity sits far from any achievable mean, so flipping one pixel
    flips exactly its own hash bit."""
    stride = ((width * 3 + 3) // 4) * 4
    buf = bytearray(height * stride)
    for j in range(width * height):
        p = (j // width) * stride + (j % width) * 3
        v = 240 if j in bright else 10
        buf[p : p + 3] = bytes([v, v, v])
    return bytes(buf)


def test_ahash_is_stable_and_discriminative():
    """Identical images hash identically; a one-pixel edit flips
    exactly one bit; an unrelated image moves many."""
    bright = {0, 5, 7, 12, 18, 21}
    img = _bimodal_source(6, 4, bright)
    w, h, h1 = bmp_ahash(bmp_encode(6, 4, img))
    assert (w, h) == (6, 4)
    assert h1 == sum(1 << j for j in bright)  # bright pixels = set bits
    _, _, h2 = bmp_ahash(bmp_encode(6, 4, img))
    assert h1 == h2  # deterministic

    # flip ONE pixel dark->bright: exactly that bit moves
    _, _, h3 = bmp_ahash(bmp_encode(6, 4, _bimodal_source(6, 4, bright | {9})))
    assert h1 ^ h3 == 1 << 9

    # complemented image: every pixel's bit differs
    other = set(range(24)) - bright
    _, _, h4 = bmp_ahash(bmp_encode(6, 4, _bimodal_source(6, 4, other)))
    assert bin(h1 ^ h4).count("1") == 24 > w52._AHASH_T


def test_ahash_corrupt_payload_returns_none():
    assert bmp_ahash(b"not a bmp at all") is None


def test_banding_pigeonhole_is_lossless_at_threshold():
    """Hamming <= T with 4 bands of 10 bits over <= 40-bit hashes:
    T=3 < 4 bands, so by pigeonhole at least one band is untouched —
    the equi-join candidate set provably contains every true pair."""
    import itertools
    import random

    rng = random.Random(11)
    for _ in range(200):
        h1 = rng.getrandbits(40)
        flips = rng.sample(range(40), rng.randint(0, w52._AHASH_T))
        h2 = h1
        for f in flips:
            h2 ^= 1 << f
        bands1 = [
            (h1 >> (b * w52._BAND_BITS)) & (2**w52._BAND_BITS - 1)
            for b in range(w52._N_BANDS)
        ]
        bands2 = [
            (h2 >> (b * w52._BAND_BITS)) & (2**w52._BAND_BITS - 1)
            for b in range(w52._N_BANDS)
        ]
        assert any(a == b for a, b in zip(bands1, bands2))


def test_entry_verdicts_are_symmetric_and_thresholded(spark):
    rows = {r.doc_id: r for r in all_specs()["q_multimodal_image_dedup_ahash"].fn(spark, SF).collect()}
    assert len(rows) == 500
    hashes = {d: (r.width, r.height, r.ahash) for d, r in rows.items()}
    n_matched = 0
    for d, r in rows.items():
        if r.best_match_id is not None:
            n_matched += 1
            pw, ph, pa = hashes[r.best_match_id]
            assert (pw, ph) == (r.width, r.height)  # same-dims block
            assert bin(pa ^ r.ahash).count("1") == r.best_hamming
            assert r.best_hamming <= w52._AHASH_T
            # symmetry: my best match also records me as a near-dup
            assert rows[r.best_match_id].n_neardups >= 1
        else:
            assert r.n_neardups == 0
    assert n_matched > 0  # the fixture corpus contains image near-dups


def test_dhash_gradient_bit_rule():
    """dHash sets bit r*(w-1)+x iff pixel (r,x+1) out-brightens
    (r,x); identical images hash identically; corrupt payload -> None."""
    from weather_flink_spark.operators.multimodal import bmp_dhash

    w, h = 4, 2
    # row 0: dark,bright,dark,dark -> gradients: up(bit0), down, flat
    # row 1: bright,bright,dark,bright -> flat, down, up(bit5)
    src = _bimodal_source(w, h, bright={1, 4, 5, 7})
    b = bmp_encode(w, h, src)
    got = bmp_dhash(b)
    assert got is not None
    gw, gh, hsh = got
    assert (gw, gh) == (w, h)
    assert hsh == (1 << 0) | (1 << 5)
    assert bmp_dhash(b) == got  # deterministic
    assert bmp_dhash(b"not a bmp") is None


def test_union_recall_gain_over_single_hash(spark):
    """r8 verdict stretch #8 done-bar: the two perceptual tiers flag
    DIFFERENT near-dup structure on the real BMP fixtures — each
    finds matched images the other misses, so the union strictly
    out-recalls either alone (ahash = global tone, dhash = local
    horizontal gradients)."""
    def matched(key):
        rows = all_specs()[key].fn(spark, SF).collect()
        return {r.doc_id for r in rows if r.best_match_id is not None}

    a = matched("q_multimodal_image_dedup_ahash")
    d = matched("q_multimodal_image_dedup_dhash")
    assert a - d, "ahash finds no doc dhash misses"
    assert d - a, "dhash finds no doc ahash misses"
    assert len(a | d) > max(len(a), len(d))
