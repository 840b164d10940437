"""Wave-12 operators (round 3): bitmap distinct rollups, binary-
quantized Hamming search, XML source round-trip, LATERAL SQL.

- ``q_agg_bitmap_distinct`` — exact COUNT DISTINCT via bitmap rollup:
  users pack into 63-bit words (word = user div 63, bit = user mod 63)
  OR-ed per group, distinct = sum of popcounts. The shuffle carries
  (group, word) bitmaps instead of raw (group, user) pairs — the
  re-usable bitmap trick warehouses use when many queries need
  distincts over the same key space (bitmaps union across groups /
  time slices without re-deduplicating). Output carries the naive
  COUNT(DISTINCT) next to it so the equality is visible in the hash.
- ``q_sim_hamming_topk`` — binary-quantized ANN: each 64-d embedding
  compresses to ONE 64-bit sign word (bit d set iff dim d > 0); top-k
  neighbors per query by Hamming distance (popcount of XOR). The
  32x-compressed first-pass filter production vector stores run before
  exact re-ranking; pure JVM bit ops, scan-linear, bounded broadcast
  query set.
- ``q_source_xml_roundtrip`` — Spark 4 built-in XML source fidelity:
  customer written as XML, read back with the original schema,
  aggregated; oracle computes from the pristine parquet.
- ``q_sql_lateral_topk`` — LATERAL correlated subquery (top-2 per
  group via ORDER BY ... LIMIT inside the lateral): the SQL-surface
  form of per-group top-k, run verbatim on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.functions.numeric import dsum, dsum_sql
from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Bitmap exact-distinct rollup
# ---------------------------------------------------------------------------


@register(
    "q_agg_bitmap_distinct",
    oracle="""
        WITH words AS (
            -- 63-bit words: bit index stays below the sign bit, which
            -- DuckDB's << refuses to produce (overflow on 1 << 63)
            SELECT event_type, user_id // 63 AS w,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
                       AS bits
            FROM events GROUP BY event_type, user_id // 63
        ),
        bm AS (
            SELECT event_type,
                   CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_bitmap
            FROM words GROUP BY event_type
        ),
        naive AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
            FROM events GROUP BY event_type
        )
        SELECT b.event_type, b.n_distinct_bitmap, n.n_distinct_exact
        FROM bm b JOIN naive n USING (event_type)
    """,
    doc=(
        "Exact COUNT DISTINCT via bitmap rollup: users pack into 63-bit "
        "words (bit index below the sign bit both engines accept) OR-ed "
        "per (group, word), distinct = sum of popcounts. "
        "The shuffle carries one bitmap word per 63 users instead of "
        "raw (group, user) pairs, and the per-group word tables union "
        "across groups or time slices WITHOUT re-deduplicating — the "
        "warehouse bitmap trick for repeated distinct queries over a "
        "dense key space. The naive COUNT(DISTINCT) rides along so the "
        "hash gate itself proves the equality."
    ),
    tags=("aggregate", "distinct", "bitmap"),
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    words = e.groupBy(
        "event_type", F.expr("user_id div 63").alias("w")
    ).agg(
        # F.shiftleft takes a literal bit count; the column form needs expr
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(user_id % 63 as int))")
        ).alias("bits")
    )
    bm = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_bitmap")
    )
    naive = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_exact")
    )
    return bm.join(naive, "event_type")


# ---------------------------------------------------------------------------
# Binary-quantized Hamming top-k
# ---------------------------------------------------------------------------

_HAM_K = 5
_HAM_N_QUERIES = 5

_SIGN_WORD_SPARK = (
    "aggregate(sequence(0, 63), cast(0 as bigint),"
    " (acc, d) -> acc | IF(element_at(embedding, d + 1) > 0,"
    " shiftleft(cast(1 as bigint), d), cast(0 as bigint)))"
)
# bit 63 as a literal: DuckDB's << errors on 1 << 63 (signed overflow);
# bits are disjoint so bit_or-fold equals the Spark | fold exactly
_SIGN_WORD_DUCK = (
    "list_aggregate(list_transform(range(1, 65),"
    " d -> CASE WHEN embedding[d] > 0 THEN"
    " (CASE WHEN d = 64 THEN -9223372036854775807 - 1"
    " ELSE (CAST(1 AS BIGINT) << CAST(d - 1 AS INTEGER)) END)"
    " ELSE 0 END), 'bit_or')"
)


@register(
    "q_sim_hamming_topk",
    oracle=f"""
        WITH sw AS (
            SELECT vec_id, CAST({_SIGN_WORD_DUCK} AS BIGINT) AS word
            FROM embeddings
        )
        SELECT query_id, vec_id, hamming, h_rank FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   CAST(bit_count(xor(q.word, v.word)) AS BIGINT) AS hamming,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY bit_count(xor(q.word, v.word)) ASC,
                                v.vec_id ASC) AS h_rank
            FROM sw q JOIN sw v ON q.vec_id <> v.vec_id
            WHERE q.vec_id < {_HAM_N_QUERIES}
        ) WHERE h_rank <= {_HAM_K}
    """,
    doc=(
        "Binary-quantized similarity search: each 64-d embedding "
        "compresses to ONE 64-bit sign word (bit d set iff dim d > 0) "
        "and neighbors rank by Hamming distance — popcount of XOR, two "
        "instructions per comparison. The 32x-compressed first-pass "
        "filter production vector stores run before exact re-ranking "
        "(binary quantization). Scale: the sign words are a map-side "
        "projection, the query side is a bounded broadcast, and the "
        "scan is linear with pure JVM bit ops — no floats touched "
        "until a re-rank stage."
    ),
    tags=("similarity", "ann", "quantization", "llm-pipeline"),
)
def q_sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    sw = e.select("vec_id", F.expr(_SIGN_WORD_SPARK).alias("word"))
    q = sw.filter(F.col("vec_id") < _HAM_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("word").alias("q_word")
    )
    hamming = F.bit_count(F.expr("q_word ^ word"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    return (
        sw.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", hamming.cast("bigint").alias("hamming")
        )
        .withColumn("h_rank", F.row_number().over(w_rank))
        .where(F.col("h_rank") <= _HAM_K)
    )


# ---------------------------------------------------------------------------
# XML source round-trip (Spark 4 built-in XML)
# ---------------------------------------------------------------------------


@register(
    "q_source_xml_roundtrip",
    oracle=f"""
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               {dsum_sql('c_acctbal', 'sum_acctbal')},
               MAX(c_name) AS last_name
        FROM customer GROUP BY c_mktsegment
    """,
    doc=(
        "Spark 4 built-in XML source fidelity: customer written as "
        "row-tagged XML, read back with the original schema, "
        "aggregated; the oracle computes from the pristine parquet so "
        "any serialization/parse loss breaks the hash. XML is the "
        "interchange-format path (like CSV/JSONL); row-tagged files "
        "stay splittable for parallel re-reads."
    ),
    tags=("source", "xml", "roundtrip"),
)
def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    src = load(spark, sf_dir, "customer")
    out = os.path.join(
        tempfile.gettempdir(),
        f"wfs_fmt_xml_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}",
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    src.write.mode("overwrite").format("xml").option("rowTag", "customer").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(src.schema)
        .load(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        dsum("c_acctbal", "sum_acctbal"),
        F.max("c_name").alias("last_name"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (SQL surface)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT s.c_mktsegment, l.c_custkey, l.c_acctbal
    FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
         LATERAL (
             SELECT c_custkey, c_acctbal FROM customer c
             WHERE c.c_mktsegment = s.c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC
             LIMIT 2
         ) l
"""


@register(
    "q_sql_lateral_topk",
    oracle=_LATERAL_SQL,
    doc=(
        "LATERAL correlated subquery with ORDER BY ... LIMIT — the "
        "SQL-surface form of per-group top-k, run VERBATIM on both "
        "engines (Spark plans it as a rewritten window/join; DuckDB as "
        "a dependent join). Deterministic ties via the custkey "
        "secondary sort."
    ),
    tags=("sql", "subquery", "window"),
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)
