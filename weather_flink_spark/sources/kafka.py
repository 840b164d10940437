"""Kafka source/sink builders (SURVEY.md §2-A A1/A5).

Reproduces the reference's connector configuration as Structured
Streaming options:

- source (WeatherProcessingJob.java:67-77, props :31-37, group :24):
  topic ``weatherData``, consumer group ``weather-processing-job``,
  DNS ``use_all_dns_ips``, reconnect backoff 1 s → 5 s. Flink's
  ``enable.auto.commit=false`` has no Spark analog — offsets live in
  the checkpoint, which is strictly stronger.
- sink (WeatherProcessingJob.java:87,93-100): topic
  ``WeatherPresenceEvent``. Two documented semantic deltas vs Flink
  (SURVEY.md §4.3): Spark's Kafka sink is at-least-once (no Kafka
  transactions; the reference sets a transactional-id prefix), and the
  producer-record timestamp cannot be set (the payload keeps its
  ``timestamp`` field instead).

The builders return (format, options) and attach to any reader/writer,
so construction is unit-testable without a broker; ``read_weather_stream``
/ ``write_presence_stream`` wire them to a real session when one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter

SOURCE_TOPIC = "weatherData"  # WeatherProcessingJob.java:23
SINK_TOPIC = "WeatherPresenceEvent"  # WeatherProcessingJob.java:87
CONSUMER_GROUP = "weather-processing-job"  # WeatherProcessingJob.java:24


def source_options(
    bootstrap_servers: str,
    topic: str = SOURCE_TOPIC,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """Kafka source options mirroring the reference's consumer props."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # WeatherProcessingJob.java:24 — group visible to monitoring;
        # offset COMMITS still go through the Spark checkpoint
        "kafka.group.id": CONSUMER_GROUP,
        # WeatherProcessingJob.java:33-35
        "kafka.client.dns.lookup": "use_all_dns_ips",
        # WeatherProcessingJob.java:36-37
        "kafka.reconnect.backoff.ms": "1000",
        "kafka.reconnect.backoff.max.ms": "5000",
        # poison pills are dropped by the decode stage, not the source;
        # failOnDataLoss=false mirrors the reference's survive-anything
        # posture for deleted/expired offsets
        "failOnDataLoss": "false",
    }


def sink_options(bootstrap_servers: str, topic: str = SINK_TOPIC) -> dict[str, str]:
    """Kafka sink options for the presence-event producer (A5)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.client.dns.lookup": "use_all_dns_ips",
    }


def read_weather_stream(
    spark: SparkSession, bootstrap_servers: str, **overrides: str
) -> DataFrame:
    """A1: the raw Kafka stream (key/value binary + envelope columns).

    Downstream decoding is sources/framed.py (magic-dispatch Avro/JSON).
    Requires the spark-sql-kafka package on the classpath.
    """
    opts = source_options(bootstrap_servers) | overrides
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def write_presence_stream(
    records: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    **overrides: str,
) -> DataStreamWriter:
    """A5: presence-event JSON records (key/value binary) → Kafka.

    ``records`` must already be in Kafka shape — use
    sources/framed.to_presence_kafka_records (A4). Returns the
    un-started writer so callers pick the trigger.
    """
    opts = sink_options(bootstrap_servers) | overrides
    writer = records.writeStream.format("kafka").option("checkpointLocation", checkpoint_dir)
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer
