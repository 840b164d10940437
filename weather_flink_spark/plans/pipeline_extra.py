"""Third wave: pipeline-management + API-surface operators (SURVEY.md §2-C).

Covers gaps a production corpus/analytics pipeline hits after the core
relational + dedup families exist:

- ``q_join_cross``          — explicit CROSS JOIN (the one join shape the
                              inventory lacked; bounded dims only at scale).
- ``q_sql_tpch_q3``         — the SQL entry point end-to-end: registered
                              catalog views + ``spark.sql`` running a
                              TPC-H Q3-shaped join-agg (reference has no
                              SQL surface at all — pom.xml:52-98 shows no
                              flink-table dep — so this is pure north-star).
- ``q_sample_stratified``   — deterministic per-stratum hash sampling
                              (corpus downsampling that is reproducible
                              across runs/engines/cluster sizes).
- ``q_text_repetition``     — Gopher-style repetition signals: top-word
                              fraction + duplicate-trigram fraction.
- ``q_events_retention``    — daily cohort retention matrix.
- ``q_latest_snapshot``     — CDC changelog → latest-state compaction.

Same parity discipline as the other plan modules: md5-derived hashing,
decimal-exact sums, every computed column aliased identically in Spark
and the DuckDB oracle, unique tiebreakers in window ORDER BYs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Cross join
# ---------------------------------------------------------------------------


@register(
    "q_join_cross",
    oracle="""
        SELECT n.n_name, r.r_name,
               (n.n_regionkey = r.r_regionkey) AS same_region
        FROM nation n CROSS JOIN region r
    """,
    doc=(
        "Explicit cartesian product of two bounded dimensions (nation × "
        "region) with a derived flag. At scale a cross join is only ever "
        "sane dim × dim; Spark broadcasts the smaller side "
        "(BroadcastNestedLoopJoin) so no shuffle occurs."
    ),
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name",
        "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("same_region"),
    )


# ---------------------------------------------------------------------------
# SQL API surface: TPC-H Q3 over registered catalog views
# ---------------------------------------------------------------------------

_Q3_BODY = """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
"""


@register(
    "q_sql_tpch_q3",
    oracle=_Q3_BODY.format(customer="customer", orders="orders", lineitem="lineitem"),
    doc=(
        "The SQL entry point exercised end-to-end: catalog views + "
        "spark.sql running TPC-H Q3 (shipping priority) — 3-way join, "
        "selective predicates on both fact sides, decimal-exact grouped "
        "revenue. Identical SQL text runs on DuckDB as the oracle; "
        "Catalyst gets the same pushdown/join-reorder surface the "
        "DataFrame API queries get."
    ),
    tags=("sql", "join", "agg"),
)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_q3_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q3_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q3_v")
    return spark.sql(
        _Q3_BODY.format(
            customer="customer_q3_v", orders="orders_q3_v", lineitem="lineitem_q3_v"
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-language target sample percentages (downsample dominant strata harder)
_STRATA_PCT_SQL = "CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 20 ELSE 10 END"


@register(
    "q_sample_stratified",
    oracle=f"""
        WITH h AS (
            SELECT lang,
                   CAST('0x' || md5('sample:' || CAST(doc_id AS VARCHAR))[1:7]
                        AS BIGINT) % 100 AS bucket,
                   {_STRATA_PCT_SQL} AS pct
            FROM documents
        )
        SELECT lang,
               CAST(MAX(pct) AS BIGINT) AS target_pct,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE bucket < pct) AS n_sampled
        FROM h GROUP BY lang
    """,
    doc=(
        "Deterministic stratified sampling: per-language target rates "
        "applied through a seeded md5 hash bucket of the doc id — the "
        "sample is reproducible across runs, engines, and cluster sizes "
        "(never rand()/sampleBy: retries would draw a different corpus). "
        "Pure map-side expression + one partial-aggregated groupBy."
    ),
    tags=("sampling", "corpus"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(conv(substring(md5(concat('sample:', cast(doc_id as string))), 1, 7),"
        " 16, 10) as bigint) % 100"
    )
    pct = F.expr(_STRATA_PCT_SQL)
    return (
        d.select("lang", bucket.alias("bucket"), pct.alias("pct"))
        .groupBy("lang")
        .agg(
            F.max("pct").cast("bigint").alias("target_pct"),
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("bucket") < F.col("pct"), 1)).alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------


@register(
    "q_text_repetition",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        wc AS (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(tok) AS w FROM tok)
            GROUP BY doc_id, w
        ),
        topw AS (
            SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS n_words
            FROM wc GROUP BY doc_id
        ),
        tri AS (
            SELECT doc_id,
                   CASE WHEN len(tok) >= 3 THEN len(tok) - 2 ELSE 0 END AS n_trigrams,
                   CASE WHEN len(tok) >= 3 THEN
                       len(tok) - 2 - len(list_distinct(list_transform(
                           range(1, len(tok) - 1),
                           i -> tok[i] || ' ' || tok[i + 1] || ' ' || tok[i + 2])))
                   ELSE 0 END AS n_dup_trigrams
            FROM tok
        )
        SELECT t.doc_id,
               CAST(w.n_words AS BIGINT) AS n_words,
               CAST(w.top_cnt AS DOUBLE) / w.n_words AS top_word_frac,
               CAST(t.n_trigrams AS BIGINT) AS n_trigrams,
               CASE WHEN t.n_trigrams > 0
                    THEN CAST(t.n_dup_trigrams AS DOUBLE) / t.n_trigrams
               END AS dup_trigram_frac
        FROM tri t JOIN topw w ON t.doc_id = w.doc_id
    """,
    doc=(
        "Repetition quality signals (the Gopher repetition-filter family): "
        "per-document top-word fraction and duplicate word-trigram "
        "fraction. Trigram construction is a TOTAL expression (guarded "
        "sequence over token positions); the word counts flow through one "
        "explode + two partial-aggregated groupBys keyed on doc_id."
    ),
    tags=("text", "quality"),
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok")
    )
    topw = (
        tok.select("doc_id", F.explode("tok").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("n_words"))
    )
    # 0-based Spark array indexing; total: sequence only built when size>=3
    tri = tok.select(
        "doc_id",
        F.expr("IF(size(tok) >= 3, size(tok) - 2, 0)").alias("n_trigrams"),
        F.expr(
            "IF(size(tok) >= 3, size(tok) - 2 - size(array_distinct(transform("
            " sequence(0, size(tok) - 3),"
            " i -> concat(tok[i], ' ', tok[i + 1], ' ', tok[i + 2])))), 0)"
        ).alias("n_dup_trigrams"),
    )
    return tri.join(topw, "doc_id").select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        (F.col("top_cnt").cast("double") / F.col("n_words")).alias("top_word_frac"),
        F.col("n_trigrams").cast("bigint").alias("n_trigrams"),
        F.when(
            F.col("n_trigrams") > 0,
            F.col("n_dup_trigrams").cast("double") / F.col("n_trigrams"),
        ).alias("dup_trigram_frac"),
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


@register(
    "q_events_retention",
    oracle="""
        WITH firstd AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT f.cohort_day,
                   DATE_DIFF('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
                   e.user_id
            FROM events e JOIN firstd f ON e.user_id = f.user_id
        )
        SELECT cohort_day, day_offset, COUNT(*) AS n_users
        FROM act GROUP BY cohort_day, day_offset
    """,
    doc=(
        "Daily cohort retention: users bucketed by first-seen day; for "
        "each (cohort, day-offset) the count of distinct returning users. "
        "Two shuffles, both keyed on user_id until the final small "
        "rollup; the first-seen aggregate is map-side partial."
    ),
    tags=("events", "retention"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firstd = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(firstd, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


# ---------------------------------------------------------------------------
# CDC latest-state compaction
# ---------------------------------------------------------------------------


@register(
    "q_latest_snapshot",
    oracle="""
        SELECT user_id, ts AS last_ts, event_type AS last_event_type,
               value AS last_value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc=(
        "Changelog → snapshot compaction (the CDC 'latest state per key' "
        "materialization): one row per user carrying the most recent "
        "event, ties broken by event_id so the result is deterministic. "
        "Single shuffle on the key; at scale this is the standard "
        "upsert-compaction pattern for maintaining a serving table."
    ),
    tags=("events", "cdc", "window"),
)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
