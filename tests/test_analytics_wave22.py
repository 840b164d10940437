"""Wave-22 semantics beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.multimodal import wav_encode, wav_parse
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_wav_roundtrip_and_chunk_walking():
    samples = bytes(range(200))
    blob = wav_encode(16000, samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    sr, ch, bits, n, s = wav_parse(blob)
    assert (sr, ch, bits, n) == (16000, 1, 8, 200)
    assert s == sum(samples)
    # a real reader must tolerate an extra chunk BEFORE fmt/data
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    hacked = blob[:12] + extra + blob[12:]
    hacked = hacked[:4] + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    assert wav_parse(hacked) == (16000, 1, 8, 200, sum(samples))
    # odd-length chunks pad to even (RIFF rule)
    odd = bytes(range(33))
    assert wav_parse(wav_encode(8000, odd))[3] == 33


def test_wav_parse_rejects_corrupt():
    assert wav_parse(b"") is None
    assert wav_parse(b"RIFFxxxxAVI ") is None
    blob = wav_encode(8000, b"abc")
    assert wav_parse(blob[:20]) is None  # truncated


def test_decode_wav_query_matches_doc_arithmetic(spark):
    rows = {r.doc_id: r for r in all_specs()["q_multimodal_decode_wav"].fn(spark, SF).collect()}
    for d in load(spark, SF, "documents").select("doc_id", "text").limit(20).collect():
        r = rows[d.doc_id]
        b = d.text.encode("utf-8")
        rate = 8000 + d.doc_id % 4 * 4000
        assert r.sample_rate == rate and r.channels == 1 and r.bits == 8
        assert r.n_samples == len(b)
        assert r.duration_ms == len(b) * 1000 // rate
        assert r.byte_sum == sum(b)


def test_changepoint_split_maximizes_cusum_deviation(spark):
    """Re-derive the argmax for one type from the dense series."""
    rows = {r.event_type: r for r in all_specs()["q_events_changepoint"].fn(spark, SF).collect()}
    assert rows
    e = load(spark, SF, "events")
    et = sorted(rows)[0]
    hrs = (
        e.filter(F.col("event_type") == et)
        .groupBy(F.expr("cast(ts as long) div 3600").alias("hr"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    bounds = e.agg(
        F.expr("min(cast(ts as long) div 3600)"),
        F.expr("max(cast(ts as long) div 3600)"),
    ).collect()[0]
    h0, h1 = bounds[0], bounds[1]
    counts = {r.hr: r.c for r in hrs}
    y = [counts.get(h, 0) for h in range(h0, h1 + 1)]
    n, sn = len(y), sum(y)
    best_dev, best_t = -1, None
    st = 0
    for t, v in enumerate(y[:-1], start=1):
        st += v
        dev = abs(n * st - t * sn)
        if dev > best_dev:
            best_dev, best_t = dev, t
    r = rows[et]
    assert r.split_idx == best_t
    assert r.n_hours == n
    before = sum(y[:best_t]) / best_t
    after = sum(y[best_t:]) / (n - best_t)
    assert abs(r.mean_before - round(before, 6)) < 1e-9
    assert abs(r.mean_after - round(after, 6)) < 1e-9
