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


# ---------------------------------------------------------------------------
# SCD type-2 history reconstruction
# ---------------------------------------------------------------------------

# identical text runs on Spark and DuckDB (gaps-and-islands via windowed
# change flags); {events} is a temp view on Spark, the real table on DuckDB
_SCD2_BODY = """
    WITH c AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM {events}
    ), g AS (
        SELECT user_id, ts, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM c
    ), p AS (
        SELECT user_id, grp, event_type AS state,
               MIN(ts) AS valid_from, COUNT(*) AS n_events
        FROM g GROUP BY user_id, grp, event_type
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           n_events
    FROM p
"""


@register(
    "q_scd2_intervals",
    oracle=_SCD2_BODY.format(events="events"),
    doc=(
        "SCD type-2 history reconstruction (gaps-and-islands): the event "
        "changelog collapsed into per-user state intervals "
        "[valid_from, valid_to) whenever event_type changes, open-ended "
        "for the current state. Windowed change flags + running sum "
        "assign island ids — one shuffle on the key, no self-join."
    ),
    tags=("events", "cdc", "window"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("events_scd2_v")
    return spark.sql(_SCD2_BODY.format(events="events_scd2_v"))


# ---------------------------------------------------------------------------
# Approximate quantiles with accuracy bound
# ---------------------------------------------------------------------------


@register(
    "q_agg_approx_quantile",
    oracle="""
        SELECT
            CAST(CAST(ROUND(quantile_cont(o_totalprice, 0.5), 6) AS DECIMAL(18,6)) AS DOUBLE) AS p50_exact,
            CAST(CAST(ROUND(quantile_cont(o_totalprice, 0.9), 6) AS DECIMAL(18,6)) AS DOUBLE) AS p90_exact,
            TRUE AS within_bounds
        FROM orders
    """,
    doc=(
        "Approximate percentiles (Greenwald-Khanna sketch via "
        "approx_percentile) next to the exact values, with the range-"
        "relative error surfaced as a checked bound — the pattern for "
        "monitoring quantiles at 100 TB where exact percentile would "
        "need a full sort. Oracle-checked via the bounds pattern: "
        "hashed columns are the exact percentiles (DECIMAL-quantized; "
        "DuckDB quantile_cont twin) plus the Spark-computed "
        "within_bounds flag the oracle replays as TRUE; the GK sketch "
        "executes in the plan but stays out of the hashed columns."
    ),
    tags=("agg", "approx"),
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx"),
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("exact"),
        F.max("o_totalprice").alias("hi"),
        F.min("o_totalprice").alias("lo"),
    )
    return agg.select(
        # round-then-cast: snap both engines to a shared 6dp grid before
        # the decimal cast (direct casts can differ in the final bit)
        F.round(F.col("exact")[0], 6).cast("decimal(18,6)").cast("double").alias("p50_exact"),
        F.round(F.col("exact")[1], 6).cast("decimal(18,6)").cast("double").alias("p90_exact"),
        (
            (F.abs(F.col("approx")[0] - F.col("exact")[0]) <= (F.col("hi") - F.col("lo")) * 0.01)
            & (F.abs(F.col("approx")[1] - F.col("exact")[1]) <= (F.col("hi") - F.col("lo")) * 0.01)
            & (F.abs(F.col("approx")[2] - F.col("exact")[2]) <= (F.col("hi") - F.col("lo")) * 0.01)
        ).alias("within_bounds"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator accuracy audit
# ---------------------------------------------------------------------------


def _minhash_accuracy_sql() -> str:
    from weather_flink_spark.plans.llm_pipeline import (
        H28_SHINGLE_SQL,
        MINHASH_P,
        MINHASH_PERMS,
        N_BANDS,
        N_MINHASH,
    )

    def perm_sql(i: int) -> str:
        a, b = MINHASH_PERMS[i]
        return f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))"

    band_structs = ", ".join(
        "{'band_id': %d, 'band_key': md5(CAST(mh%d AS VARCHAR) || '|' || CAST(mh%d AS VARCHAR))}"
        % (b, 2 * b, 2 * b + 1)
        for b in range(N_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tok FROM documents
        ), hashed AS (
            SELECT doc_id, {H28_SHINGLE_SQL} AS hs FROM t
        ), sig AS (
            SELECT doc_id,
                {", ".join(f"{perm_sql(i)} AS mh{i}" for i in range(N_MINHASH))}
            FROM hashed
        ), bands AS (
            SELECT doc_id, UNNEST([{band_structs}]) AS band FROM sig
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band.band_id = b.band.band_id
             AND a.band.band_key = b.band.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               ({agree}) / {float(N_MINHASH)} AS est_jaccard,
               CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                 / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)))
                 AS exact_jaccard,
               ABS(({agree}) / {float(N_MINHASH)}
                   - CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
                     / (len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))))
                 AS abs_err
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b
        JOIN hashed x ON x.doc_id = c.doc_a
        JOIN hashed y ON y.doc_id = c.doc_b
    """


@register(
    "q_dedup_minhash_accuracy",
    oracle=_minhash_accuracy_sql(),
    doc=(
        "Estimator-quality audit for the MinHash pipeline: for every "
        "LSH-blocked candidate pair, the signature-agreement Jaccard "
        "estimate (8 universal-hash perms) next to the exact "
        "hashed-shingle Jaccard and their absolute error. Everything is "
        "md5-deterministic, so even the error column hash-matches the "
        "DuckDB oracle — the audit itself is reproducible at scale."
    ),
    tags=("dedup", "lsh", "audit"),
)
def q_dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import (
        N_MINHASH,
        _perm_value,
        minhash_bands,
        shingle_table,
    )

    sh = shingle_table(spark, sf_dir)

    def perm_min(i: int) -> F.Column:
        return F.array_min(
            F.transform(F.col("shingle_h28"), lambda h: _perm_value(h, i))
        )

    from weather_flink_spark.plans.llm_pipeline import _cached

    sig = _cached(
        "mh_sig_full",
        spark,
        sf_dir,
        lambda: sh.select(
            "doc_id", *[perm_min(i).alias(f"mh{i}") for i in range(N_MINHASH)]
        ).persist(),
    )
    bands = minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    x, y = sh.alias("x"), sh.alias("y")
    n_agree = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = n_agree / float(N_MINHASH)
    inter = F.size(F.array_intersect(F.col("x.shingle_h28"), F.col("y.shingle_h28")))
    union = F.size(F.col("x.shingle_h28")) + F.size(F.col("y.shingle_h28")) - inter
    exact = inter.cast("double") / union
    return (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, cand.doc_b == F.col("sb.doc_id"))
        .join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped z-score anomaly detection
# ---------------------------------------------------------------------------


@register(
    "q_events_anomaly_zscore",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                        AS DOUBLE) AS sx2,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               ROUND((e.value - s.sx / s.n)
                     / SQRT((s.sx2 - s.sx * s.sx / s.n) / (s.n - 1)), 6) AS z
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE ABS((e.value - s.sx / s.n)
                  / SQRT((s.sx2 - s.sx * s.sx / s.n) / (s.n - 1))) > 2
    """,
    doc=(
        "Grouped z-score anomaly detection: per-event-type mean/stddev "
        "from exact decimal moment sums (order-independent), outliers at "
        "|z| > 2. The stats aggregate is tiny and broadcast back onto "
        "the fact — one shuffle for the moments, none for the scoring."
    ),
    tags=("events", "stats", "anomaly"),
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        F.sum(x * x).cast("double").alias("sx2"),
        F.sum(x).cast("double").alias("sx"),
        F.count("*").alias("n"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt((F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


# ---------------------------------------------------------------------------
# CDC merge/upsert classification
# ---------------------------------------------------------------------------

_MERGE_CUTOFF = "2024-01-20 00:00:00"


@register(
    "q_cdc_merge_upsert",
    oracle=f"""
        WITH base AS (
            SELECT user_id, ts, event_type, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF}'
            ) WHERE rn = 1
        ), delta AS (
            SELECT user_id, ts, event_type, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF}'
            ) WHERE rn = 1
        )
        SELECT COALESCE(d.user_id, b.user_id) AS user_id,
               CASE WHEN d.user_id IS NULL THEN 'keep'
                    WHEN b.user_id IS NULL THEN 'insert'
                    ELSE 'update' END AS action,
               COALESCE(d.ts, b.ts) AS final_ts,
               COALESCE(d.event_type, b.event_type) AS final_event_type,
               COALESCE(d.value, b.value) AS final_value
        FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    """,
    doc=(
        "CDC MERGE/upsert semantics without a table format: the serving "
        "snapshot (latest state before the cutoff) merged with a "
        "changelog delta (events after it) via full outer join — rows "
        "classified insert/update/keep with last-writer-wins payloads. "
        "This is the nightly-compaction shape Delta/Iceberg MERGE INTO "
        "executes; both sides shuffle once on the merge key."
    ),
    tags=("events", "cdc", "merge"),
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cutoff = F.lit(_MERGE_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "ts", "event_type", "value")
        )

    base = latest(e.filter(F.col("ts") < cutoff)).alias("b")
    delta = latest(e.filter(F.col("ts") >= cutoff)).alias("d")
    action = (
        F.when(F.col("d.user_id").isNull(), "keep")
        .when(F.col("b.user_id").isNull(), "insert")
        .otherwise("update")
    )
    return base.join(delta, F.col("b.user_id") == F.col("d.user_id"), "full_outer").select(
        F.coalesce(F.col("d.user_id"), F.col("b.user_id")).alias("user_id"),
        action.alias("action"),
        F.coalesce(F.col("d.ts"), F.col("b.ts")).alias("final_ts"),
        F.coalesce(F.col("d.event_type"), F.col("b.event_type")).alias("final_event_type"),
        F.coalesce(F.col("d.value"), F.col("b.value")).alias("final_value"),
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE window (moving 1-hour aggregate per key)
# ---------------------------------------------------------------------------

_TIME_RANGE_BODY = """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
    FROM {events}
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register(
    "q_win_time_range",
    oracle=_TIME_RANGE_BODY.format(
        events="(SELECT *, epoch(ts) AS epoch_s FROM events)"
    ),
    doc=(
        "Time-interval RANGE frame: per-user trailing 1-hour event count "
        "and decimal-exact value sum at every event. The frame bound is "
        "value-based (epoch seconds), not row-based — the moving-window "
        "shape rows-frames cannot express when event spacing is "
        "irregular. One shuffle on the key; frame evaluation is a "
        "single sorted pass per partition."
    ),
    tags=("window", "range", "events"),
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    e.createOrReplaceTempView("events_timerange_v")
    return spark.sql(_TIME_RANGE_BODY.format(events="events_timerange_v"))


# ---------------------------------------------------------------------------
# Boolean / conditional aggregates
# ---------------------------------------------------------------------------


@register(
    "q_agg_boolean",
    oracle="""
        SELECT event_type,
               COUNT(*) FILTER (WHERE value > 100) AS n_large,
               bool_and(value > 0) AS all_positive,
               bool_or(value > 500) AS any_huge,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    doc=(
        "Boolean/conditional aggregate family: count_if, universal "
        "(bool_and/every) and existential (bool_or/any) quantifiers per "
        "group — all partial-aggregable, so the shuffle carries three "
        "booleans and two longs per group regardless of input size."
    ),
    tags=("agg", "boolean"),
)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_large"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 500).alias("any_huge"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# String aggregation (LISTAGG) and regex-array extraction
# ---------------------------------------------------------------------------


@register(
    "q_agg_string",
    oracle="""
        SELECT r.r_name,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    doc=(
        "LISTAGG/string_agg: nations per region as a deterministic "
        "comma-joined sorted list. Safe only because the group is a "
        "bounded dimension — the same ordered-concat over an unbounded "
        "fact would be banned by the bounded-collect rule."
    ),
    tags=("agg", "string"),
)
def q_agg_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@register(
    "q_string_regex_extract_all",
    oracle="""
        SELECT c_custkey,
               regexp_extract_all(c_name, '[0-9]+') AS digit_runs,
               CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS INTEGER) AS n_runs,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        FROM customer
    """,
    doc=(
        "Array-returning regex family: every digit run extracted per "
        "row (regexp_extract_all) plus global-replace masking — the "
        "PII-scrub primitive pair. Pure map-side codegen expressions; "
        "the oracle pins Java-vs-RE2 dialect agreement on the character "
        "classes the engine permits."
    ),
    tags=("string", "regex"),
)
def q_string_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("regexp_extract_all(c_name, '[0-9]+', 0)").alias("digit_runs"),
        F.size(F.expr("regexp_extract_all(c_name, '[0-9]+', 0)")).alias("n_runs"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

# identical text runs on Spark 4.1 and DuckDB: a recursive calendar
# spine left-joined against the fact so zero-event days still surface
_RECURSIVE_BODY = """
    WITH RECURSIVE days(d) AS (
        SELECT DATE '2024-01-01'
        UNION ALL
        SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
        WHERE d < DATE '2024-01-30'
    )
    SELECT days.d AS day, COUNT(e.event_id) AS n_events
    FROM days LEFT JOIN {events} e ON CAST(e.ts AS DATE) = days.d
    GROUP BY days.d
"""


@register(
    "q_sql_recursive_cte",
    oracle=_RECURSIVE_BODY.format(events="events"),
    doc=(
        "Recursive CTE (WITH RECURSIVE, Spark 4): a 30-day calendar "
        "spine generated recursively, left-joined to events so "
        "zero-activity days appear with count 0 — the dense date "
        "dimension pattern without any stored calendar table. The "
        "recursion is driver-cheap (30 rows); the join/agg stay "
        "distributed."
    ),
    tags=("sql", "recursive", "events"),
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("events_rec_v")
    return spark.sql(_RECURSIVE_BODY.format(events="events_rec_v"))
