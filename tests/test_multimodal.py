"""Multimodal binary-column tests (operators/multimodal.py).

The Spark plumbing — payload assembly, metadata struct, Arrow batch
iteration, UDTF-style frame fan-out — is asserted here, plus the
GENUINE BMP codec (bmp_encode/bmp_parse: real little-endian header
fields, stride/padding arithmetic, tolerant decode of corrupt input).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.multimodal import (
    attach_payload,
    bmp_encode,
    bmp_parse,
    decode_bmp,
    decode_image,
    encode_bmp_payload,
    extract_binary_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return attach_payload(load(spark, sf_dir, "documents").limit(20)).persist()


def test_attach_payload_schema_and_meta(payloads):
    row = payloads.filter(F.col("doc_id") == 0).first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["media_meta"]["mime"] == "text/plain"
    assert row["media_meta"]["n_bytes"] == len(row["payload"])
    assert row["media_meta"]["encoding"] == "utf-8"


def test_extract_binary_features_matches_python(payloads):
    feats = {r["doc_id"]: r for r in extract_binary_features(payloads).collect()}
    for row in payloads.collect():
        b, f = bytes(row["payload"]), feats[row["doc_id"]]
        assert f["n_bytes"] == len(b)
        assert f["first_byte"] == b[0]
        assert f["last_byte"] == b[-1]
        assert f["byte_sum_16"] == sum(b[:16])


def test_decode_image_real_path_tolerates_non_bmp(payloads):
    """fake=False is the REAL decoder now: text/plain payloads are not
    BMPs, so they tolerate-decode to nulls (never an exception — the A2
    drop-bad-records discipline)."""
    rows = decode_image(payloads, fake=False).collect()
    assert rows
    assert all(r["width"] is None and r["height"] is None for r in rows)


def test_bmp_roundtrip_header_and_pixel_sum():
    """Pure-Python codec: parse(encode(...)) returns the declared
    dimensions and the padding-excluded pixel sum."""
    src = bytes(range(1, 41))
    for w, h in [(4, 2), (5, 3), (8, 5), (1, 1)]:
        blob = bmp_encode(w, h, src)
        assert blob[:2] == b"BM"
        parsed = bmp_parse(blob)
        assert parsed is not None
        pw, ph, bpp, stride, psum = parsed
        assert (pw, ph, bpp) == (w, h, 24)
        assert stride == ((w * 3 + 3) // 4) * 4 and stride % 4 == 0
        # recompute the expected sum from the cycled source, skipping
        # the padding byte positions the encoder also fills
        expect = sum(
            src[(r * stride + c) % len(src)]
            for r in range(h)
            for c in range(w * 3)
        )
        assert psum == expect


def test_bmp_parse_rejects_corrupt_input():
    assert bmp_parse(b"") is None
    assert bmp_parse(b"PNG....") is None
    assert bmp_parse(b"BM" + b"\x00" * 20) is None  # truncated header
    blob = bmp_encode(6, 4, b"abcdef")
    assert bmp_parse(blob[:-5]) is None  # truncated pixel array


def test_decode_bmp_on_spark_matches_local_parse(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(25).select("doc_id", "text")
    got = {r["doc_id"]: r for r in decode_bmp(encode_bmp_payload(d)).collect()}
    for row in d.collect():
        blob = bmp_encode(
            4 + row["doc_id"] % 5, 2 + row["doc_id"] % 4, row["text"].encode()
        )
        w, h, bpp, stride, psum = bmp_parse(blob)
        g = got[row["doc_id"]]
        assert (g["width"], g["height"], g["bpp"], g["stride"], g["pixel_sum"]) == (
            w, h, bpp, stride, psum,
        )


def test_decode_image_fake_is_deterministic(payloads):
    a = {r["doc_id"]: (r["width"], r["height"]) for r in decode_image(payloads, fake=True).collect()}
    b = {r["doc_id"]: (r["width"], r["height"]) for r in decode_image(payloads, fake=True).collect()}
    assert a == b
    assert all(1 <= w <= 64 and 1 <= h <= 64 for (w, h) in a.values())


def test_sample_frames_fanout_shape(payloads):
    frames = sample_frames(payloads, frame_size=32, stride=4)
    rows = frames.collect()
    assert len(rows) > len(payloads.collect())  # UDTF fan-out happened
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, doc_rows in by_doc.items():
        idxs = sorted(r["frame_idx"] for r in doc_rows)
        assert idxs == list(range(0, 4 * len(idxs), 4))  # stride respected
        assert all(r["frame_bytes"] == len(r["frame"]) == 32 for r in doc_rows)
