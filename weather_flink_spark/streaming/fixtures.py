"""Deterministic streaming fixtures (FIXTURES.md §1).

Builds the reference's Kafka wire-format input as local parquet files
with a single ``value: binary`` column (the shape Spark's Kafka source
delivers), so file-source streaming tests replay the exact ingest path
without a broker:

- v0/v1 writer schemas (evolution: v0 lacks temperature/humidity)
- an unknown-magic frame (registry miss → dropped)
- a wrong-schema-name frame (name guard → dropped)
- a corrupt body (poison pill → dropped)
- per-device out-of-order timestamps within 3.5 s + one late-beyond-
  watermark record (event-time tests)
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from weather_flink_spark.sources.avro_codec import RecordSchema, encode_record
from weather_flink_spark.sources.framed import SchemaRegistry, WEATHER_READER_SCHEMA, frame

V0_SCHEMA = {
    "type": "record",
    "name": "WeatherData",
    "fields": [
        {"name": "deviceId", "type": "string"},
        {"name": "timestamp", "type": "long"},
        {"name": "station", "type": ["null", "string"], "default": None},
    ],
}
V1_SCHEMA = WEATHER_READER_SCHEMA  # adds temperature/humidity

WRONG_NAME_SCHEMA = {
    "type": "record",
    "name": "NotWeatherData",
    "fields": [
        {"name": "deviceId", "type": "string"},
        {"name": "timestamp", "type": "long"},
    ],
}

REGISTRY = SchemaRegistry({0: V0_SCHEMA, 1: V1_SCHEMA, 9: WRONG_NAME_SCHEMA})

BASE_MS = 1_700_000_000_000  # fixed epoch base for determinism


def weather_records() -> list[tuple[int, dict]]:
    """(magic, record) sequence: 3 devices, two session bursts each.

    Timestamps are deliberately out of order within 3.5 s; the final
    record of dev-0 is >> late (beyond any watermark once later events
    arrived). 24 good records total: 12 v0 + 12 v1.
    """
    recs: list[tuple[int, dict]] = []
    for d in range(3):
        dev = f"dev-{d}"
        t0 = BASE_MS + d * 1_000
        # burst 1: 4 events, slightly out of order
        for off in (0, 2_000, 1_000, 3_000):
            recs.append(
                (
                    d % 2,
                    {
                        "deviceId": dev,
                        "timestamp": t0 + off,
                        "temperature": 20.0 + d + off / 1000.0,
                        "humidity": 0.5,
                        "station": f"st-{d}" if d != 1 else None,
                    },
                )
            )
        # burst 2: 60 s later (new session for 30 s gap semantics)
        for off in (60_000, 61_500, 61_000, 63_000):
            recs.append(
                (
                    (d + 1) % 2,
                    {
                        "deviceId": dev,
                        "timestamp": t0 + off,
                        "temperature": 25.0 + d,
                        "humidity": 0.6,
                        "station": f"st-{d}" if d != 1 else None,
                    },
                )
            )
    # dev-0 late straggler: 5 s before its burst-2 events (arrives last)
    recs.append(
        (
            1,
            {
                "deviceId": "dev-0",
                "timestamp": BASE_MS + 55_000,
                "temperature": 19.0,
                "humidity": 0.4,
                "station": "st-0",
            },
        )
    )
    return recs


def framed_values() -> list[bytes]:
    """The wire bytes: good records + the three poison frames."""
    values = []
    for magic, rec in weather_records():
        writer = RecordSchema.parse(REGISTRY.schemas[magic])
        values.append(frame(magic, encode_record(writer, rec)))
    wrong = RecordSchema.parse(WRONG_NAME_SCHEMA)
    values.append(frame(9, encode_record(wrong, {"deviceId": "ghost", "timestamp": BASE_MS})))
    values.append(frame(7, b"\x02\x04unknown-magic"))
    values.append(frame(1, b"\xff\xff\xff"))  # truncated/corrupt body
    return values


def json_framed_values() -> list[bytes]:
    """Same records JSON-framed (for the pure-Catalyst decode path)."""
    import json as _json

    values = []
    for magic, rec in weather_records():
        body = _json.dumps({k: v for k, v in rec.items() if v is not None}).encode()
        values.append(frame(magic, body))
    values.append(frame(7, b'{"deviceId": "x", "timestamp": 1}'))  # unknown magic
    values.append(frame(1, b"{not json"))  # corrupt body
    values.append(frame(0, b'{"other": 1}'))  # missing required fields
    return values


def write_value_files(spark: SparkSession, dirname: str, values: list[bytes], n_files: int = 2) -> str:
    """Write value-binary rows as n_files parquet files in a fresh dir.

    Written directly with pyarrow: a Spark write job costs seconds of
    scheduling for a 28-row fixture; pyarrow costs milliseconds. The
    files are plain parquet — Spark's file source reads them the same.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(dirname):
        shutil.rmtree(dirname)
    os.makedirs(dirname)
    chunks = [values[i::n_files] for i in range(n_files)]
    base = int(time.time())
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        path = os.path.join(dirname, f"part-{i:05d}.parquet")
        table = pa.table({"value": pa.array(chunk, type=pa.binary())})
        pq.write_table(table, path)
        # strictly increasing mtimes: Spark's file stream orders new
        # files by modification time, and files written milliseconds
        # apart can TIE — the tie-break then decides batch order, which
        # flips stateful results (observed: s_rate_limit admitting 12
        # vs 13 rows depending on which half processed first)
        os.utime(path, (base + i, base + i))
    return dirname


def append_value_file(dirname: str, values: list[bytes], name: str) -> str:
    """Append one more parquet file (for multi-batch mtime-ordered tests)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(dirname, name)
    pq.write_table(pa.table({"value": pa.array(values, type=pa.binary())}), path)
    # strictly later than every existing file (same tie rationale as
    # write_value_files): the appended file must form the LAST batch
    mx = max(
        os.path.getmtime(os.path.join(dirname, f))
        for f in os.listdir(dirname)
    )
    os.utime(path, (mx + 1, mx + 1))
    return path


def read_value_stream(spark: SparkSession, dirname: str) -> DataFrame:
    schema = T.StructType([T.StructField("value", T.BinaryType())])
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dirname)
