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
        "event type as an array. collect_list only ever sees rows that "
        "survived a row_number() ≤ k rank filter, so per-group state is "
        "bounded at k everywhere — never collect-then-slice, which "
        "materializes the whole group and OOMs at 100 TB."
    ),
    tags=("agg", "collect"),
)
def q_agg_collect_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    top = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(value, event_id))), p -> p.value)"
            ).alias("smallest_values")
        )
    )
    counts = e.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return top.join(counts, "event_type").select(
        "event_type", "smallest_values", "n_events"
    )


@register(
    "q_union_schema_evolution",
    oracle="""
        WITH evolved AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS writer
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS writer
            FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT writer, COUNT(*) AS n_rows,
               COUNT(o_orderpriority) AS n_with_priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM evolved GROUP BY writer
    """,
    doc=(
        "Schema evolution in batch — the A2 resolving-decoder semantics "
        "(writer→reader field matching by name, nulls for fields the "
        "writer lacks; WeatherKafkaAvroDeserializerSchema.java:53) as "
        "unionByName(allowMissingColumns=True) over an old-writer "
        "projection and a new-writer projection of the same table. The "
        "aggregate proves the missing column surfaced as null exactly "
        "for old-writer rows."
    ),
    tags=("source", "schema-evolution"),
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    v1 = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .withColumn("writer", F.lit("v1"))
    )
    v2 = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("writer", F.lit("v2"))
    )
    evolved = v1.unionByName(v2, allowMissingColumns=True)
    return evolved.groupBy("writer").agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderpriority").alias("n_with_priority"),
        dsum("o_totalprice", "sum_price"),
    )


N_BAD_RECORDS = 3


@register(
    "q_source_badrecords_tolerant",
    oracle=f"""
        SELECT COUNT(*) AS n_good, CAST({N_BAD_RECORDS} AS BIGINT) AS n_bad
        FROM orders
    """,
    doc=(
        "Poison-pill tolerance for batch sources — the A2 drop-on-error "
        "semantics (WeatherKafkaAvroDeserializerSchema.java:65-67) on "
        "the file path: orders as JSONL plus 3 injected garbage lines, "
        "read in PERMISSIVE mode with a _corrupt_record capture column. "
        "The scan must recover every good row exactly and quarantine "
        "exactly the 3 bad ones — the stream-never-dies contract, "
        "with accounting instead of silence."
    ),
    tags=("source", "json", "error-tolerance"),
)
def q_source_badrecords_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    src = load(spark, sf_dir, "orders")
    out = _fmt_dir("badrec", sf_dir)
    src.write.mode("overwrite").json(out)
    bad_lines = ["not json at all {{{", '{"o_orderkey": "truncated', "\x00garbage\x01"]
    with open(os.path.join(out, "part-bad.json"), "w") as f:
        f.write("\n".join(bad_lines[:N_BAD_RECORDS]) + "\n")
    schema = T.StructType(
        list(src.schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # Spark forbids plans referencing ONLY the corrupt column
    # (SQLSTATE 0A000); counting a data column alongside satisfies it —
    # corrupt rows parse every data column as null, so count(o_orderkey)
    # is exactly the good-row count
    return back.agg(
        F.count("o_orderkey").alias("n_good"),
        F.count("_corrupt_record").alias("n_bad"),
    )


@register(
    "q_text_bigram_lm",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        big AS (
            SELECT UNNEST(list_transform(range(1, len(tok)),
                          i -> tok[i] || ' ' || tok[i + 1])) AS bigram
            FROM tok
        ),
        bc AS (
            SELECT bigram, COUNT(*) AS c_bigram FROM big GROUP BY bigram
        ),
        pc AS (
            SELECT string_split(bigram, ' ')[1] AS prefix,
                   SUM(c_bigram) AS c_prefix
            FROM bc GROUP BY 1
        )
        SELECT bc.bigram, bc.c_bigram,
               CAST(pc.c_prefix AS BIGINT) AS c_prefix,
               CAST(bc.c_bigram AS DOUBLE) / pc.c_prefix AS cond_prob
        FROM bc JOIN pc ON string_split(bc.bigram, ' ')[1] = pc.prefix
        WHERE bc.c_bigram >= 20
    """,
    doc=(
        "Bigram language-model table: corpus-wide bigram counts and the "
        "conditional probability P(w2|w1) = c(w1 w2) / c(w1 ·), kept to "
        "bigrams seen ≥ 20 times. Two partial-aggregated shuffles "
        "(bigram, then prefix) and a broadcast-sized join back — the "
        "n-gram statistics pass every LM data pipeline runs at corpus "
        "scale."
    ),
    tags=("text", "ngram", "lm"),
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = F.expr("filter(split(text, ' '), t -> t <> '')")
    bigrams = F.expr(
        "IF(size(tok) >= 2,"
        " transform(sequence(0, size(tok) - 2), i -> concat(tok[i], ' ', tok[i + 1])),"
        " array())"
    )
    from weather_flink_spark.plans.llm_pipeline import _cached

    bc = _cached(
        "bigram_lm_counts",
        spark,
        sf_dir,
        lambda: (
            d.select(tok.alias("tok"))
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram")
            .agg(F.count("*").alias("c_bigram"))
            .persist()
        ),
    )
    prefix = F.split(F.col("bigram"), " ")[0]
    pc = bc.groupBy(prefix.alias("prefix")).agg(
        F.sum("c_bigram").cast("bigint").alias("c_prefix")
    )
    return (
        bc.filter(F.col("c_bigram") >= 20)
        .join(F.broadcast(pc), prefix == F.col("prefix"))
        .select(
            "bigram",
            "c_bigram",
            "c_prefix",
            (F.col("c_bigram").cast("double") / F.col("c_prefix")).alias("cond_prob"),
        )
    )
