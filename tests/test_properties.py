"""Property-based tests (hypothesis) for scalar/codec edge cases.

SURVEY.md §5.2: property tests cover what the oracle corpus can't —
nulls, empty arrays, unicode, adversarial byte strings — on the
engine's pure-Python kernels and expression builders. Spark round-trips
are batched (one DataFrame per property run) to keep JVM calls off the
per-example hot path.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from weather_flink_spark.sources.avro_codec import RecordSchema, decode_record, encode_record
from weather_flink_spark.sources.framed import SchemaRegistry, frame
from weather_flink_spark.streaming.fixtures import V0_SCHEMA, V1_SCHEMA

TEXTISH = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"), max_size=80
)


# ---------------------------------------------------------------------------
# Avro codec: encode→decode round-trip + evolution laws
# ---------------------------------------------------------------------------

records_v1 = st.fixed_dictionaries(
    {
        "deviceId": TEXTISH,
        "timestamp": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "temperature": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        "humidity": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
        "station": st.one_of(st.none(), TEXTISH),
    }
)


@settings(max_examples=200, deadline=None)
@given(records_v1)
def test_avro_roundtrip_v1(rec):
    writer = RecordSchema.parse(V1_SCHEMA)
    assert decode_record(writer, writer, encode_record(writer, rec)) == rec


@settings(max_examples=200, deadline=None)
@given(records_v1)
def test_avro_evolution_v0_writer_v1_reader_defaults(rec):
    """v0 writer (no temp/humidity) → v1 reader fills declared defaults."""
    v0 = {k: rec[k] for k in ("deviceId", "timestamp", "station")}
    writer = RecordSchema.parse(V0_SCHEMA)
    reader = RecordSchema.parse(V1_SCHEMA)
    out = decode_record(writer, reader, encode_record(writer, v0))
    assert out["deviceId"] == rec["deviceId"]
    assert out["timestamp"] == rec["timestamp"]
    assert out["temperature"] is None and out["humidity"] is None


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_corrupt_frames_never_crash_registry_path(payload):
    """Any byte garbage either decodes or raises — never hangs/segfaults;
    the streaming path maps raises to drops."""
    reg = SchemaRegistry({0: V0_SCHEMA, 1: V1_SCHEMA})
    framed = frame(1, payload)
    writer = reg.writer(framed[0])
    try:
        out = decode_record(writer, RecordSchema.parse(V1_SCHEMA), framed[1:])
        assert isinstance(out, dict)
    except Exception:
        pass  # poison pill → dropped by the stream decoder


# ---------------------------------------------------------------------------
# Luhn kernel (functions/udf_surface.py row-UDF body)
# ---------------------------------------------------------------------------


def _luhn(s):
    if s is None or not s.isdigit():
        return None
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            d -= 9 if d > 9 else 0
        total += d
    return str((10 - total % 10) % 10)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789", min_size=1, max_size=24))
def test_luhn_check_digit_validates(s):
    """Appending the computed check digit always yields a Luhn-valid number."""
    d = _luhn(s)
    full = s + d
    total = 0
    for i, ch in enumerate(reversed(full)):
        v = int(ch)
        if i % 2 == 1:
            v *= 2
            v -= 9 if v > 9 else 0
        total += v
    assert total % 10 == 0


# ---------------------------------------------------------------------------
# Spark expression builders on adversarial input (batched round-trips)
# ---------------------------------------------------------------------------


def test_shingles_and_quality_on_edge_documents(spark):
    """Empty strings, single tokens, repeated tokens, unicode — the text
    expression builders must stay total (no nulls, sane bounds)."""
    from pyspark.sql import functions as F

    from weather_flink_spark.plans.llm_pipeline import shingles_col, tokens_col

    docs = [
        "",
        " ",
        "one",
        "a a a a a a",
        "naïve café résumé naïve café résumé naïve",
        "x " * 500,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    out = df.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tok"),
        F.size(shingles_col(tokens_col())).alias("n_sh"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i in range(len(docs)):
        r = by_id[i]
        assert r["n_tok"] >= 1  # split never returns null/empty array
        # total: < 3 tokens → 0 shingles; else bounded by n_tok - 2
        assert 0 <= r["n_sh"] <= max(r["n_tok"] - 2, 0)
    assert by_id[2]["n_sh"] == 0  # single token → no 3-shingles
    assert by_id[3]["n_sh"] == 1  # all-identical tokens → one distinct shingle


def test_repetition_and_bigram_builders_total_on_edge_documents(spark):
    """The q_text_repetition trigram builder and q_text_bigram_lm bigram
    builder must be TOTAL: no out-of-bounds access on 0/1/2-token docs
    (the exact trap hypothesis caught in the round-1 shingle builder)."""
    from pyspark.sql import functions as F

    docs = ["", " ", "one", "two words", "now three words", "a a", "a a a a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    tok = F.expr("filter(split(text, ' '), t -> t <> '')")
    tri_dups = F.expr(
        "IF(size(tok) >= 3, size(tok) - 2 - size(array_distinct(transform("
        " sequence(0, size(tok) - 3),"
        " i -> concat(tok[i], ' ', tok[i + 1], ' ', tok[i + 2])))), 0)"
    )
    bigrams = F.expr(
        "IF(size(tok) >= 2,"
        " transform(sequence(0, size(tok) - 2), i -> concat(tok[i], ' ', tok[i + 1])),"
        " array())"
    )
    out = (
        df.select("doc_id", tok.alias("tok"))
        .select(
            "doc_id",
            F.size("tok").alias("n"),
            tri_dups.alias("n_dup_tri"),
            F.size(bigrams).alias("n_big"),
        )
        .collect()
    )
    by_id = {r["doc_id"]: r for r in out}
    for r in out:
        assert r["n_dup_tri"] >= 0
        assert r["n_big"] == max(r["n"] - 1, 0)
    assert by_id[5]["n_big"] == 1  # "a a" → one bigram
    assert by_id[6]["n_dup_tri"] == 1  # "a a a a" → 2 identical trigrams → 1 dup
