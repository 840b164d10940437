"""Multi-format source/sink round-trips (SURVEY.md §2-C scans/sources row).

The reference's only connector is Kafka (pom.xml:64-68); the engine's
north star is a general analytics store, so the batch format surface —
CSV, JSON-lines, ORC, parquet (parquet round-trip lives in
relational_extra.q_sink_partitioned_roundtrip) — is exercised
end-to-end: write the catalog table out in the format, read it back
with an explicit schema, aggregate, and hash-match the DuckDB oracle
computed from the original parquet. A value surviving
parquet → format → Spark → aggregate bit-identically is the strongest
fidelity check the driver's hash gate can express.

Scale notes: every writer here produces splittable output (ORC/parquet
natively; CSV/JSON by virtue of one-record-per-line), so a 100 TB
re-read parallelizes by input split exactly like the parquet scans.
Text formats cost ~5-10× parquet on scan (no column pruning, no
predicate pushdown, full parse per row) — they are ingest/interchange
formats here, never the storage layer.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


def _fmt_dir(tag: str, sf_dir: str) -> str:
    d = os.path.join(
        tempfile.gettempdir(), f"wfs_fmt_{tag}_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    )
    if os.path.exists(d):
        shutil.rmtree(d)
    return d


@register(
    "q_source_csv_roundtrip",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal,
               MIN(c_name) AS first_name
        FROM customer GROUP BY c_mktsegment
    """,
    doc=(
        "CSV source fidelity: customer written as headered CSV, read "
        "back with the original schema (doubles survive via shortest- "
        "round-trip repr), aggregated. Oracle computes from the pristine "
        "parquet — any parse/format loss breaks the hash."
    ),
    tags=("source", "csv", "roundtrip"),
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load(spark, sf_dir, "customer")
    out = _fmt_dir("csv", sf_dir)
    src.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema(src.schema).option("header", "true").csv(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        dsum("c_acctbal", "sum_acctbal"),
        F.min("c_name").alias("first_name"),
    )


@register(
    "q_source_jsonl_roundtrip",
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
               MAX(o_orderdate) AS last_order
        FROM orders GROUP BY o_orderstatus
    """,
    doc=(
        "JSON-lines source fidelity: orders written as JSONL (timestamps "
        "serialized ISO-8601 in the UTC session), read back with the "
        "original schema, aggregated including a MAX over the round- "
        "tripped timestamp. One record per line keeps the files "
        "splittable for parallel re-reads."
    ),
    tags=("source", "json", "roundtrip"),
)
def q_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load(spark, sf_dir, "orders")
    out = _fmt_dir("jsonl", sf_dir)
    src.write.mode("overwrite").json(out)
    back = spark.read.schema(src.schema).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "q_source_orc_roundtrip",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "ORC source/sink: the filtered fact written as ORC and read "
        "back — the second columnar format besides parquet, with the "
        "same pushdown/pruning machinery (predicate applied on the "
        "re-read to exercise ORC scan filters)."
    ),
    tags=("source", "orc", "roundtrip"),
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load(spark, sf_dir, "lineitem")
    out = _fmt_dir("orc", sf_dir)
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), dsum("l_quantity", "sum_qty")
    )


@register(
    "q_sink_kafka_payload",
    oracle="""
        SELECT CAST(user_id AS VARCHAR) AS key,
               to_json(struct_pack(
                   event_id := event_id,
                   event_type := event_type,
                   value := value,
                   "timestamp" := epoch_ms(ts))) AS value,
               epoch_ms(ts) AS record_ts
        FROM events
    """,
    doc=(
        "The A4 egress payload as a batch twin "
        "(WeatherPresenceSerializationSchema.java:30-40): key = entity "
        "id string, value = compact JSON object with the event-time "
        "epoch-millis carried INSIDE the payload (the documented "
        "mitigation for Spark's Kafka sink not setting producer-record "
        "timestamps), record_ts alongside. The JSON text itself is "
        "hash-compared against DuckDB's to_json — byte-level payload "
        "parity, not just row counts."
    ),
    tags=("sink", "kafka", "json"),
)
def q_sink_kafka_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    epoch_ms = F.unix_millis(F.col("ts"))
    return e.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.col("value"),
                epoch_ms.alias("timestamp"),
            )
        ).alias("value"),
        epoch_ms.alias("record_ts"),
    )


@register(
    "q_agg_collect_bounded",
    oracle="""
        SELECT event_type,
               (list(value ORDER BY value, event_id))[1:5] AS smallest_values,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    doc=(
        "Bounded ordered collection per group: the 5 smallest values per "
        "event type as an array. The deliberate contrast with unbounded "
        "collect_list: at 100 TB a per-group array must be bounded "
        "(top-k slice) or the executor OOMs — the engine's rule is "
        "collect only after an explicit bound."
    ),
    tags=("agg", "collect"),
)
def q_agg_collect_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # sort by (value, event_id) for a deterministic tie order, then
    # project the value component — mirrors the oracle's ORDER BY
    return e.groupBy("event_type").agg(
        F.expr(
            "transform(slice(array_sort(collect_list(struct(value, event_id))), 1, 5),"
            " p -> p.value)"
        ).alias("smallest_values"),
        F.count("*").alias("n_events"),
    )
