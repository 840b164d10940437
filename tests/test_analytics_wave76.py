"""Wave-76: the JPEG-shaped lossy DCT container (r10 verdict task #7 —
done-bar: lossy-roundtrip fixtures, an oracle-replayed decode entry,
and a dedup-tier test across lossy/lossless versions)."""

from __future__ import annotations

import zlib

from weather_flink_spark.operators.multimodal import (
    _intens_ahash,
    _intens_dhash,
    _intens_phash,
    _zlib_frame,
    dct_encode,
    dct_parse,
    dct_quantize,
    dct_reconstruct,
)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _fixture(d: int, text: str):
    w, h = 4 + d % 5, 2 + d % 4
    src = text.encode("utf-8")
    gray = [src[i % len(src)] for i in range(w * h)]
    return w, h, src, gray


def test_lossy_roundtrip_is_lossy_and_bounded():
    """The codec must be GENUINELY lossy (JPEG-table quantization at
    the JPEG operating point — some doc loses > 5 intensity levels)
    yet bounded (the integer inverse reconstructs within a constant):
    a 'lossy' codec whose roundtrip is exact would prove nothing about
    tier survival."""
    worst = 0
    for d in range(40):
        w, h, src, gray = _fixture(d, f"Lossy fixture doc {d} payload {d * 13}")
        parsed = dct_parse(dct_encode(w, h, src))
        assert parsed is not None
        pw, ph, quant, recon = parsed
        assert (pw, ph) == (w, h)
        err = max(abs(a - b) for a, b in zip(gray, recon))
        worst = max(worst, err)
        assert err <= 64, (d, err)  # bounded reconstruction
        # quantization really truncates: never all 64 coefs survive
        assert 0 < sum(1 for q in quant if q != 0) < 64
    assert worst > 5, worst  # genuinely lossy


def test_container_is_tolerant_and_exercises_dynamic_deflate():
    """LJ01 payloads carry an r11 dynamic-Huffman DEFLATE body
    (BTYPE=10 — the lossy path exercises the full compressed-container
    stack); corrupt/truncated payloads decode to None (A2)."""
    b = dct_encode(6, 4, b"container test payload")
    # zlib header (2 bytes) then the first deflate byte: BFINAL+BTYPE=10
    assert b[:4] == b"LJ01"
    assert b[10] & 7 == 0b101
    raw = zlib.decompress(bytes(b[8:]))
    assert len(raw) == 128  # 64 int16 coefficients
    assert dct_parse(b[:12]) is None
    assert dct_parse(b"XXXX" + bytes(b[4:])) is None
    mangled = bytearray(b)
    mangled[-1] ^= 0xFF  # break the adler checksum
    assert dct_parse(bytes(mangled)) is None


def test_quantize_reconstruct_are_pure_integer_and_deterministic():
    """Two encodes of the same raster are byte-identical (no float
    state, no randomness) and quantize/reconstruct round-trip through
    the container unchanged."""
    w, h, src, gray = _fixture(3, "determinism probe text")
    assert dct_encode(w, h, src) == dct_encode(w, h, src)
    quant = dct_quantize(gray, w, h)
    _, _, quant2, recon2 = dct_parse(dct_encode(w, h, src))
    assert quant == quant2
    block = dct_reconstruct(quant)
    assert recon2 == [block[r * 8 + c] for r in range(h) for c in range(w)]


def test_dedup_tier_survival_profile_across_lossy_lossless():
    """THE task-#7 claim, measured: across the lossy (LJ01 recon) and
    lossless (original raster) versions of the same image, the ahash
    tier drifts <= 3 bits on EVERY fixture (near-dup threshold — the
    union-tier verdict pairs every lossy/lossless twin through it),
    while dhash — neighbor deltas, exactly what coefficient truncation
    perturbs — measurably degrades on a nontrivial fraction, and phash
    sits between. A tier profile, not a uniform claim."""
    drift = {"ahash": 0, "dhash": 0, "phash": 0}
    union_paired = 0
    n = 100
    for d in range(n):
        w, h, src, gray = _fixture(d, f"Lorem ipsum doc {d} with variety {d * 13} payload")
        _, _, _, recon = dct_parse(dct_encode(w, h, src))
        hams = {
            "ahash": bin(_intens_ahash(gray, w, h) ^ _intens_ahash(recon, w, h)).count("1"),
            "dhash": bin(_intens_dhash(gray, w, h) ^ _intens_dhash(recon, w, h)).count("1"),
            "phash": bin(_intens_phash(gray, w, h) ^ _intens_phash(recon, w, h)).count("1"),
        }
        assert hams["ahash"] <= 3, (d, hams)  # the surviving tier
        for k, v in hams.items():
            drift[k] += v > 3
        if min(hams.values()) <= 3:  # wave-57-style union verdict
            union_paired += 1
    assert union_paired == n  # every lossy/lossless twin still pairs
    assert drift["ahash"] == 0
    # the brittle-tier finding is real, not noise: dhash drifts on a
    # measurable fraction (known JPEG behavior), more than phash
    assert drift["dhash"] > 5, drift
    assert drift["dhash"] >= drift["phash"], drift


def test_decode_entry_values(spark):
    """Entry sanity at the fixture: 500 rows, dims follow the rule,
    the loss and hash columns match a local recompute for a sample."""
    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_decode_dct"].fn(spark, SF).collect()
    }
    assert len(rows) == 500
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < 10"
    ).fetchall()
    for doc_id, text in docs:
        w, h, src, gray = _fixture(doc_id, text)
        _, _, quant, recon = dct_parse(dct_encode(w, h, src))
        r = rows[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.dc_quant == quant[0]
        assert r.n_nonzero == sum(1 for q in quant if q != 0)
        assert r.recon_sum == sum(recon)
        assert r.max_abs_err == max(abs(a - b) for a, b in zip(gray, recon))
        assert r.ahash_hamming == bin(
            _intens_ahash(gray, w, h) ^ _intens_ahash(recon, w, h)
        ).count("1")
        assert r.ahash_hamming <= 3

def test_multiblock_tiling_roundtrip_and_assembly():
    """The general tiling: multi-tile images reconstruct with the same
    bounded loss; the assembled raster's tile seams follow the indexing
    rule exactly (each pixel comes from ITS tile's reconstruction);
    single-tile behavior is the old path bit-for-bit."""
    from weather_flink_spark.operators.multimodal import (
        dct_n_tiles,
        dct_quantize,
    )

    for w, h in [(9, 6), (16, 10), (12, 9), (20, 3), (3, 20)]:
        src = f"multi-block {w}x{h} payload with variety".encode()
        gray = [src[i % len(src)] for i in range(w * h)]
        pw, ph, quant, recon = dct_parse(dct_encode(w, h, src))
        n_br, n_bc = dct_n_tiles(w, h)
        assert (pw, ph) == (w, h)
        assert n_br * n_bc >= 2  # genuinely multi-tile
        assert len(quant) == 64 * n_br * n_bc and len(recon) == w * h
        assert max(abs(a - b) for a, b in zip(gray, recon)) <= 64
        # per-tile coefficients match an independent per-tile forward
        for br in range(n_br):
            for bc in range(n_bc):
                t = br * n_bc + bc
                assert quant[64 * t : 64 * (t + 1)] == dct_quantize(
                    gray, w, h, br, bc
                ), (w, h, br, bc)
        # assembled raster indexes blocks row-major per tile
        blocks = [
            dct_reconstruct(quant[64 * t : 64 * (t + 1)])
            for t in range(n_br * n_bc)
        ]
        for r in range(h):
            for c in range(w):
                assert (
                    recon[r * w + c]
                    == blocks[(r // 8) * n_bc + (c // 8)][(r % 8) * 8 + c % 8]
                )


def test_tiled_entry_values_and_honest_drift_distribution(spark):
    """Tiled-entry sanity: 500 rows at the bigger dims rule, every
    image multi-tile, audit columns match a local recompute. The
    honest multi-block finding is pinned as a DISTRIBUTION, not a
    per-doc claim: on larger text-noise images the ahash tier drifts
    MORE (median ~4.8% of bits, p-max 15%) than on the tiny
    single-block fixtures (<=2 absolute bits) — lossy dedup pairing
    measurably degrades as adversarial (pixel-noise) images grow,
    which is exactly what a 100 TB curation pipeline must budget for
    (real photos are smooth and quantize far better; stated in the
    module doc)."""
    from weather_flink_spark.operators.multimodal import dct_n_tiles

    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_decode_dct_tiled"]
        .fn(spark, SF)
        .collect()
    }
    assert len(rows) == 500
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < 8"
    ).fetchall()
    for doc_id, text in docs:
        w, h = 9 + doc_id % 8, 6 + doc_id % 5
        n_br, n_bc = dct_n_tiles(w, h)
        assert n_br * n_bc >= 2
        src = text.encode("utf-8")
        gray = [src[i % len(src)] for i in range(w * h)]
        _, _, quant, recon = dct_parse(dct_encode(w, h, src))
        r = rows[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.dc_quant == quant[0]
        assert r.n_nonzero == sum(1 for q in quant if q != 0)
        assert r.recon_sum == sum(recon)
        assert r.max_abs_err == max(abs(a - b) for a, b in zip(gray, recon))
        assert r.ahash_hamming == bin(
            _intens_ahash(gray, w, h) ^ _intens_ahash(recon, w, h)
        ).count("1")
    # the measured drift distribution (ahash bits differ / total bits):
    # median ~0.048, 85.6% within the single-block 7.5% threshold,
    # max 0.15 — pinned one notch loose so data regeneration can move
    # it without masking a real codec regression
    rels = sorted(
        r.ahash_hamming / (r.width * r.height) for r in rows.values()
    )
    n = len(rels)
    assert rels[n // 2] <= 0.06, rels[n // 2]
    assert sum(1 for x in rels if x <= 0.075) / n >= 0.80
    assert rels[-1] <= 0.20, rels[-1]

