"""End-to-end job test: the reference's declared pipeline, assembled.

file fixture (Kafka wire shape) → magic-dispatch decode → observe tap →
3.5 s watermark → presence transitions → keyed JSON records → sink.
"""

from __future__ import annotations

import json
import os
import tempfile

from weather_flink_spark.sources.kafka import sink_options, source_options
from weather_flink_spark.streaming import fixtures as fx
from weather_flink_spark.streaming.weather_job import JobConfig, run


def test_kafka_option_builders_reproduce_reference_props():
    src = source_options("broker:9092")
    assert src["subscribe"] == "weatherData"
    assert src["kafka.group.id"] == "weather-processing-job"
    assert src["kafka.client.dns.lookup"] == "use_all_dns_ips"
    assert src["kafka.reconnect.backoff.ms"] == "1000"
    assert src["kafka.reconnect.backoff.max.ms"] == "5000"
    snk = sink_options("broker:9092")
    assert snk["topic"] == "WeatherPresenceEvent"


def test_job_config_merges_args_over_env(monkeypatch):
    monkeypatch.setenv("WEATHER_PRESENCE_GAP_MS", "10000")
    conf = JobConfig.from_env_and_args(["--presence.gap.ms=20000", "--trigger=availableNow"])
    assert conf.get("presence.gap.ms") == "20000"  # args win
    assert conf.get("trigger") == "availableNow"


def test_end_to_end_presence_pipeline(spark):
    d = os.path.join(tempfile.gettempdir(), "wfs_job_e2e")
    fx.write_value_files(spark, d, fx.json_framed_values(), n_files=1)
    conf = JobConfig(
        {
            "source.path": d,
            "payload.format": "json",
            "sink.table": "job_e2e_out",
            "trigger": "availableNow",
        }
    )
    q = run(spark, conf)
    q.awaitTermination(120)
    # observe() tap: poison frames dropped before the tap sees records
    total_tapped = sum(
        p["observedMetrics"]["tap"]["n_records"]
        for p in q.recentProgress
        if "tap" in p.get("observedMetrics", {})
    )
    assert total_tapped == 25

    out = spark.table("job_e2e_out").collect()
    assert len(out) > 0
    payloads = [json.loads(bytes(r["value"])) for r in out]
    # A4 shape: key = deviceId bytes; JSON carries transition fields
    assert {bytes(r["key"]).decode() for r in out} <= {"dev-0", "dev-1", "dev-2"}
    assert all({"deviceId", "transition", "at"} <= set(p) for p in payloads)
    assert {p["transition"] for p in payloads} <= {"online", "offline"}
