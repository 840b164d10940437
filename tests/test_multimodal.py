"""Multimodal binary-column plumbing tests (operators/multimodal.py).

The codecs are stubbed (none ship in this environment) but the Spark
plumbing — payload assembly, metadata struct, Arrow batch iteration,
UDTF-style frame fan-out — is real and asserted here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.multimodal import (
    attach_payload,
    decode_image,
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


def test_decode_image_stub_raises_without_fake(payloads):
    with pytest.raises(Exception) as exc_info:
        decode_image(payloads, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)


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
