"""Wave-73: PNG — the first compressed container (r9 verdict task #6
— done-bar: decode parity units + an image-dedup entry over the PNG
corpus)."""

from __future__ import annotations

import zlib

from weather_flink_spark.operators.multimodal import (
    bmp_ahash,
    bmp_dhash,
    bmp_encode,
    bmp_phash,
    deflate_fixed,
    deflate_stored,
    png_encode,
    png_hashes,
    png_parse,
)
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_deflate_writers_are_valid_rfc1951():
    """Both hand-rolled DEFLATE shapes must inflate bit-exactly with
    the stdlib zlib decoder (the spec reference)."""
    for raw in [b"", b"a", b"hello world" * 50, bytes(range(256)) * 7]:
        for body in (deflate_stored(raw), deflate_fixed(raw)):
            framed = (
                b"\x78\x01" + body + (zlib.adler32(raw) & 0xFFFFFFFF).to_bytes(4, "big")
            )
            assert zlib.decompress(framed) == raw


def test_png_roundtrip_both_modes_and_filters():
    """encode -> parse recovers the exact cycled-source raster for
    every fixture dim combination, under BOTH deflate modes — the
    Sub-filtered odd rows prove real unfiltering, not a pass-through."""
    for d in range(20):
        w, h = 4 + d % 5, 2 + d % 4
        src = f"doc {d} text content with some variety {d * 7}".encode()
        b = png_encode(w, h, src, mode=("stored", "fixed", "dynamic")[d % 3])
        got = png_parse(b)
        assert got is not None
        gw, gh, pix = got
        expect = bytes(src[i % len(src)] for i in range(w * h * 3))
        assert (gw, gh, pix) == (w, h, expect), d


def test_png_unfilter_handles_all_five_filter_types():
    """A hand-built PNG using Up/Average/Paeth rows (which our encoder
    never emits) must still decode — the decoder implements the spec,
    not just its own writer."""
    import struct

    from weather_flink_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        _zlib_frame,
    )

    w, h = 4, 5
    raw = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    lines = bytearray()
    prior = bytes(w * 3)
    for r in range(h):
        row = raw[r * w * 3 : (r + 1) * w * 3]
        f = r  # filters 0,1,2,3,4 — one of each
        lines.append(f)
        enc = bytearray()
        for i in range(len(row)):
            a = row[i - 3] if i >= 3 else 0
            b_ = prior[i]
            c = prior[i - 3] if i >= 3 else 0
            if f == 0:
                enc.append(row[i])
            elif f == 1:
                enc.append((row[i] - a) & 0xFF)
            elif f == 2:
                enc.append((row[i] - b_) & 0xFF)
            elif f == 3:
                enc.append((row[i] - (a + b_) // 2) & 0xFF)
            else:
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                enc.append((row[i] - pred) & 0xFF)
        lines += enc
        prior = row
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib_frame(deflate_stored(bytes(lines)), bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )
    got = png_parse(png)
    assert got is not None and got[2] == raw


def test_cross_container_hash_equality_on_padding_free_widths():
    """Where the BMP stride adds no padding (widths 4 and 8), the BMP
    and PNG rasters coincide, so all three perceptual hashes must be
    EQUAL across containers — swapping the decoder leaves dedup
    verdicts untouched (the r9 verdict's exact claim)."""
    checked = 0
    for d in range(20):
        w, h = 4 + d % 5, 2 + d % 4
        if (w * 3) % 4 != 0:
            continue
        src = f"cross check {d}".encode()
        png = png_hashes(png_encode(w, h, src, mode=("stored", "fixed", "dynamic")[d % 3]))
        bmp = bmp_encode(w, h, src)
        assert png[2] == bmp_ahash(bmp)[2]
        assert png[3] == bmp_dhash(bmp)[2]
        assert png[4] == bmp_phash(bmp)[2]
        checked += 1
    assert checked >= 8


def test_png_corrupt_payloads_tolerate_to_none():
    assert png_parse(b"garbage") is None
    assert png_parse(b"") is None
    good = png_encode(5, 3, b"x", mode="fixed")
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    assert png_parse(bytes(bad)) is None
    trunc = good[: len(good) // 2]
    assert png_parse(trunc) is None


def test_png_decode_entry_reads_block_type_from_the_stream(spark):
    """deflate_mode comes from the actual IDAT bit stream; the fixture
    cycles stored/fixed/dynamic by doc_id%3 (r11), so all THREE RFC
    1951 block shapes must appear and agree with the rule."""
    rows = all_specs()["q_multimodal_decode_png"].fn(spark, SF).collect()
    assert len(rows) == 500
    seen = set()
    for r in rows:
        assert r.deflate_mode == ("stored", "fixed", "dynamic")[r.doc_id % 3]
        assert r.n_pixel_bytes == r.width * r.height * 3
        seen.add(r.deflate_mode)
    assert seen == {"stored", "fixed", "dynamic"}


def test_deflate_dynamic_is_valid_rfc1951():
    """The r11 dynamic-Huffman writer (BTYPE=10 — what real-world PNG
    encoders emit; r10 verdict task #4) must inflate bit-exactly with
    stdlib zlib on every edge the fixtures can produce: empty payload,
    single-symbol alphabet, full byte range (9-bit-territory values
    >= 144 included), long streams past the stored-block 0xFFFF limit."""
    from weather_flink_spark.operators.multimodal import (
        _zlib_frame,
        deflate_dynamic,
    )

    cases = [
        b"",
        b"a",
        b"\x00" * 70000,
        b"hello world" * 50,
        bytes(range(256)) * 7,
        "héllo wörld ünïcode ".encode("utf-8") * 37,
    ]
    for raw in cases:
        body = deflate_dynamic(raw)
        assert body[0] & 7 == 0b101  # BFINAL=1, BTYPE=10 in bits 1-2
        assert zlib.decompress(_zlib_frame(body, raw)) == raw
    # the header is DATA-BUILT (a real dynamic table, not a disguised
    # fixed one): different histograms produce different headers
    a = deflate_dynamic(b"aaaabbbbcccc")
    b = deflate_dynamic(bytes(range(200)))
    assert a[:8] != b[:8]


def test_png_pixels_and_hashes_identical_across_all_three_modes():
    """The r10 verdict task #4 done-bar: a dynamic-Huffman IDAT of the
    same raster decodes to pixel-identical output (and therefore
    hash-identical perceptual tiers) as the fixed-Huffman and stored
    encodings — compression mode provably cannot move a dedup verdict."""
    for d in range(12):
        w, h = 4 + d % 5, 2 + d % 4
        src = f"cross-mode doc {d} payload {d * 13}".encode()
        parsed = {
            m: png_parse(png_encode(w, h, src, mode=m))
            for m in ("stored", "fixed", "dynamic")
        }
        assert parsed["stored"] is not None
        assert parsed["stored"] == parsed["fixed"] == parsed["dynamic"]
        hashes = {
            m: png_hashes(png_encode(w, h, src, mode=m))
            for m in ("stored", "fixed", "dynamic")
        }
        assert hashes["stored"] == hashes["fixed"] == hashes["dynamic"]


def test_png_dedup_entry_finds_neardups(spark):
    """The compressed-container dedup tier finds real near-dups on the
    fixture corpus (the BMP ahash tier finds 243 at sf0.001 — the PNG
    raster differs only by padding bytes, so the count is the same
    order)."""
    rows = all_specs()["q_multimodal_image_dedup_png"].fn(spark, SF).collect()
    assert len(rows) == 500
    flagged = [r for r in rows if r.n_neardups > 0]
    assert len(flagged) > 100
    for r in flagged[:20]:
        assert r.best_match_id is not None and r.best_hamming <= 3


def test_resize_nearest_neighbor_arithmetic(spark):
    """Thumbnail cell (x, y) must equal the intensity of source pixel
    (x*w//3, y*h//2) — checked independently against the decoded
    raster for a sample of docs."""
    from weather_flink_spark.operators.multimodal import (
        png_encode,
        png_parse,
        resize_thumb,
    )

    rows = {
        r.doc_id: r
        for r in all_specs()["q_multimodal_image_resize"].fn(spark, SF).collect()
    }
    assert len(rows) == 500
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < 12"
    ).fetchall()
    for doc_id, text in docs:
        w, h = 4 + doc_id % 5, 2 + doc_id % 4
        _, _, pix = png_parse(
            png_encode(
                w, h, text.encode("utf-8"),
                mode=("stored", "fixed", "dynamic")[doc_id % 3],
            )
        )
        expect = resize_thumb(pix, w, h, 3, 2)
        r = rows[doc_id]
        got = [r.t0, r.t1, r.t2, r.t3, r.t4, r.t5]
        assert got == expect, doc_id
        for y in range(2):
            for x in range(3):
                p = ((y * h // 2) * w + (x * w // 3)) * 3
                assert expect[y * 3 + x] == pix[p] + pix[p + 1] + pix[p + 2]
