"""Wave-18 operators (round 4): intermittent-demand forecasting,
Bayesian A/B, raw-PCM audio features, feature hashing, a data-quality
expectations report, partition-balance diagnostics, and vector range
search.

- ``q_orders_croston`` — Croston's method for intermittent demand
  (sparse series where most periods are zero): per part, EWMA of
  demand sizes and of inter-demand intervals, forecast = size/interval.
  Sequential recursion per series (the Holt discipline: dyadic alpha,
  recursive-CTE oracle, bit-exact doubles).
- ``q_stats_bayes_ab`` — Bayesian A/B with Beta(1,1) priors: posterior
  moments per arm and P(B>A) via the moment-matched normal
  approximation (A&S 26.2.17 Phi, the BH-FDR expression discipline).
- ``q_multimodal_pcm_features`` — REAL audio-path decode: payloads
  interpreted as signed 8-bit PCM; per doc the peak amplitude, integer-
  exact energy, RMS and zero-crossing count — genuine byte arithmetic
  (raw PCM needs no codec library), the audio sibling of the BMP codec.
- ``q_text_hashing_trick`` — the hashing-trick featurizer (signed
  64-bucket feature hashing): collision-tolerant fixed-width features
  from unbounded vocab, the scalable text-featurization baseline.
- ``q_quality_expectations`` — Deequ-style expectations report: named
  rules (row counts, key uniqueness, FK integrity, value ranges, null
  budget) each with observed value and pass verdict in one table.
- ``q_diag_partition_balance`` — shuffle-design diagnostic: for
  candidate partition keys, the md5-hash-mod-32 partition histogram's
  max/avg skew ratio — what you check BEFORE picking a 100 TB shuffle
  key.
- ``q_sim_range_search`` — range variant of similarity search: all
  corpus vectors within a cosine radius of each query (top-k's
  complement; the dedup-candidate generation shape).

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Croston intermittent-demand forecasting
# ---------------------------------------------------------------------------

# dyadic smoothing constant: 0.25/0.75 are exact binary doubles
_CRO_ALPHA = 0.25
_CRO_MAX_PART = 200  # bounded series set (parts are the series key)


@register(
    "q_orders_croston",
    oracle=f"""
        WITH RECURSIVE demand AS MATERIALIZED (
            SELECT l_partkey AS pk,
                   CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) // 604800 AS wk,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS z
            FROM lineitem
            WHERE l_partkey < {_CRO_MAX_PART}
            GROUP BY 1, 2
        ),
        ser AS MATERIALIZED (
            SELECT pk, z,
                   wk - LAG(wk) OVER (PARTITION BY pk ORDER BY wk) AS gap,
                   ROW_NUMBER() OVER (PARTITION BY pk ORDER BY wk) AS rn,
                   COUNT(*) OVER (PARTITION BY pk) AS n
            FROM demand
        ),
        eligible AS MATERIALIZED (SELECT * FROM ser WHERE n >= 2),
        rec(pk, t, n, zs, ps) AS (
            -- init: size = first demand, interval = first observed gap
            SELECT s1.pk, 2, s1.n, s1.z, CAST(s2.gap AS DOUBLE)
            FROM eligible s1
            JOIN eligible s2 ON s2.pk = s1.pk AND s2.rn = 2
            WHERE s1.rn = 1
            UNION ALL
            SELECT r.pk, r.t + 1, r.n,
                   CAST({_CRO_ALPHA} AS DOUBLE) * e.z
                       + CAST({1 - _CRO_ALPHA} AS DOUBLE) * r.zs,
                   CAST({_CRO_ALPHA} AS DOUBLE) * CAST(e.gap AS DOUBLE)
                       + CAST({1 - _CRO_ALPHA} AS DOUBLE) * r.ps
            FROM rec r
            JOIN eligible e ON e.pk = r.pk AND e.rn = r.t
            WHERE r.t <= r.n
        )
        SELECT pk AS partkey, n AS n_demand_periods,
               zs AS demand_size, ps AS demand_interval,
               zs / ps AS forecast_per_week
        FROM rec WHERE t = n + 1
    """,
    doc=(
        "Croston's method for intermittent demand — the standard "
        "forecaster when most periods have ZERO demand (spare parts, "
        "long-tail SKUs) and plain exponential smoothing biases toward "
        "zero: per part, weekly demand events update an EWMA of demand "
        "SIZE and an EWMA of the INTER-DEMAND interval (alpha=0.25, "
        "dyadic), forecast rate = size/interval. The weekly rollup is "
        "one partial-aggregable groupBy; the recursion runs per series "
        "in applyInPandas over the bounded demand-event list and is "
        "replayed op-for-op by a recursive-CTE oracle (bit-exact "
        "doubles, the Holt discipline)."
    ),
    tags=("timeseries", "forecast", "pandas-udf"),
)
def q_orders_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    li = load(spark, sf_dir, "lineitem")
    demand = (
        li.filter(F.col("l_partkey") < _CRO_MAX_PART)
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.expr(
                "cast(cast(l_shipdate as timestamp) as long) div 604800"
            ).alias("wk"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(14,2)"))
            .cast("double")
            .alias("z")
        )
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("wk").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame(
                columns=[
                    "partkey",
                    "n_demand_periods",
                    "demand_size",
                    "demand_interval",
                    "forecast_per_week",
                ]
            )
        z = pdf["z"].to_numpy(dtype="float64")
        wk = pdf["wk"].to_numpy(dtype="int64")
        zs = z[0]
        ps = float(wk[1] - wk[0])
        a, oma = _CRO_ALPHA, 1 - _CRO_ALPHA
        for t in range(1, len(z)):
            zs = a * z[t] + oma * zs
            ps = a * float(wk[t] - wk[t - 1]) + oma * ps
        return pd.DataFrame(
            {
                "partkey": [int(pdf["pk"].iloc[0])],
                "n_demand_periods": [len(z)],
                "demand_size": [zs],
                "demand_interval": [ps],
                "forecast_per_week": [zs / ps],
            }
        )

    schema = (
        "partkey long, n_demand_periods long, demand_size double,"
        " demand_interval double, forecast_per_week double"
    )
    return demand.groupBy("pk").applyInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Bayesian A/B test
# ---------------------------------------------------------------------------

_AB_ARM_SPARK = (
    "cast(conv(substring(md5(concat('bayes:', cast(user_id as string))), 1, 7),"
    " 16, 10) as bigint) % 2"
)
_AB_ARM_DUCK = (
    "CAST('0x' || md5('bayes:' || CAST(user_id AS VARCHAR))[1:7] AS BIGINT) % 2"
)


@register(
    "q_stats_bayes_ab",
    oracle=f"""
        WITH assign AS (
            SELECT user_id, {_AB_ARM_DUCK} AS arm,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(converted) AS BIGINT) AS conv
            FROM assign GROUP BY arm
        ),
        post AS (
            SELECT
                MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
                MAX(CASE WHEN arm = 0 THEN conv END) AS conv_a,
                MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
                MAX(CASE WHEN arm = 1 THEN conv END) AS conv_b
            FROM arms
        ),
        mom AS (
            SELECT *,
                (1.0 + conv_a) / (2.0 + n_a) AS mu_a,
                (1.0 + conv_b) / (2.0 + n_b) AS mu_b,
                ((1.0 + conv_a) * (1.0 + n_a - conv_a))
                    / ((2.0 + n_a) * (2.0 + n_a) * (3.0 + n_a)) AS var_a,
                ((1.0 + conv_b) * (1.0 + n_b - conv_b))
                    / ((2.0 + n_b) * (2.0 + n_b) * (3.0 + n_b)) AS var_b
            FROM post
        ),
        zc AS (
            SELECT *, ROUND((mu_b - mu_a) / SQRT(var_a + var_b), 6) AS z
            FROM mom
        ),
        phi AS (
            SELECT *, ABS(z) AS x FROM zc
        ),
        phi2 AS (
            SELECT *, 1.0 / (1.0 + 0.2316419 * x) AS t,
                   0.3989422804014327 * EXP(-0.5 * x * x) AS pdf
            FROM phi
        ),
        q AS (
            SELECT *, ROUND(pdf * t * (0.319381530 + t * (-0.356563782
                       + t * (1.781477937 + t * (-1.821255978
                       + t * 1.330274429)))), 6) AS tail
            FROM phi2
        )
        SELECT n_a, conv_a, n_b, conv_b,
               ROUND(mu_a, 6) AS rate_a, ROUND(mu_b, 6) AS rate_b, z,
               CASE WHEN z >= 0 THEN 1.0 - tail ELSE tail END
                   AS prob_b_beats_a
        FROM q
    """,
    doc=(
        "Bayesian A/B test on per-user conversion (converted = any "
        "purchase event): seeded-md5 50/50 assignment, Beta(1,1) "
        "priors, posterior Beta moments per arm, and P(B>A) by the "
        "moment-matched normal approximation with Phi from the "
        "Abramowitz-Stegun 26.2.17 polynomial — the identical-Horner-"
        "double-ops discipline of q_stats_benjamini_hochberg, so both "
        "engines produce the same probability to the 6th decimal. "
        "Everything before the final closed forms is integer counts; "
        "one distinct-user rollup and a 2-row pivot."
    ),
    tags=("statistics", "experimentation"),
)
def q_stats_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(F.expr(_AB_ARM_SPARK).alias("arm"), "converted")
    arms = assign.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    post = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    mu_a = (1.0 + F.col("conv_a")) / (2.0 + F.col("n_a"))
    mu_b = (1.0 + F.col("conv_b")) / (2.0 + F.col("n_b"))
    var_a = ((1.0 + F.col("conv_a")) * (1.0 + F.col("n_a") - F.col("conv_a"))) / (
        (2.0 + F.col("n_a")) * (2.0 + F.col("n_a")) * (3.0 + F.col("n_a"))
    )
    var_b = ((1.0 + F.col("conv_b")) * (1.0 + F.col("n_b") - F.col("conv_b"))) / (
        (2.0 + F.col("n_b")) * (2.0 + F.col("n_b")) * (3.0 + F.col("n_b"))
    )
    z = F.round((mu_b - mu_a) / F.sqrt(var_a + var_b), 6)
    x = F.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * x)
    pdf = 0.3989422804014327 * F.exp(-0.5 * x * x)
    tail = F.round(
        pdf
        * t
        * (
            0.319381530
            + t
            * (
                -0.356563782
                + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
            )
        ),
        6,
    )
    return post.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(mu_a, 6).alias("rate_a"),
        F.round(mu_b, 6).alias("rate_b"),
        z.alias("z"),
        F.when(z >= 0, 1.0 - tail).otherwise(tail).alias("prob_b_beats_a"),
    )


# ---------------------------------------------------------------------------
# Raw-PCM audio features (real byte arithmetic, no codec needed)
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_pcm_features",
    oracle="""
        WITH s AS (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                       i -> CASE WHEN ascii(text[CAST(i AS INTEGER)]) < 128
                                 THEN ascii(text[CAST(i AS INTEGER)])
                                 ELSE ascii(text[CAST(i AS INTEGER)]) - 256
                            END) AS pcm
            FROM documents
        )
        SELECT doc_id,
               CAST(len(pcm) AS BIGINT) AS n_samples,
               CAST(list_aggregate(list_transform(pcm, v -> ABS(v)), 'max')
                    AS BIGINT) AS peak,
               CAST(list_sum(list_transform(pcm, v -> v * v)) AS BIGINT)
                   AS energy,
               ROUND(SQRT(CAST(list_sum(list_transform(pcm, v -> v * v))
                               AS DOUBLE) / len(pcm)), 6) AS rms,
               CAST(len(list_filter(range(1, len(pcm)),
                        i -> pcm[CAST(i AS INTEGER)]
                             * pcm[CAST(i AS INTEGER) + 1] < 0))
                    AS BIGINT) AS zero_crossings
        FROM s
    """,
    doc=(
        "REAL audio-path feature extraction: each document's payload "
        "bytes are interpreted as signed 8-bit PCM samples (raw PCM is "
        "an actual audio wire format and needs no codec library — the "
        "audio sibling of the wave-15 BMP codec), and the Arrow-batched "
        "kernel computes peak amplitude, integer-exact energy "
        "(sum of squares in BIGINT), 6dp RMS and the zero-crossing "
        "count. The oracle replays the byte arithmetic over the text's "
        "character codes. Scale: a narrow mapInPandas, binary never "
        "shuffles; at 100 TB this is the waveform-statistics pass an "
        "audio curation pipeline runs before any model."
    ),
    tags=("multimodal", "binary", "pandas-udf", "llm-pipeline"),
)
def q_multimodal_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("peak", T.LongType()),
            T.StructField("energy", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                b = bytes(payload)
                pcm = [v if v < 128 else v - 256 for v in b]
                n = len(pcm)
                energy = sum(v * v for v in pcm)
                zc = sum(
                    1 for i in range(n - 1) if pcm[i] * pcm[i + 1] < 0
                )
                rows.append(
                    (
                        int(doc_id),
                        n,
                        max(abs(v) for v in pcm) if n else 0,
                        energy,
                        round(math.sqrt(energy / n), 6) if n else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "peak",
                    "energy",
                    "rms",
                    "zero_crossings",
                ],
            )

    return d.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64
_FH_DOCS = 100
_FH_B_SPARK = (
    "cast(conv(substring(md5(concat('feat:', token)), 1, 7), 16, 10)"
    f" as bigint) % {_FH_BUCKETS}"
)
_FH_B_DUCK = (
    "CAST('0x' || md5('feat:' || token)[1:7] AS BIGINT)"
    f" % {_FH_BUCKETS}"
)
_FH_S_SPARK = (
    "cast(conv(substring(md5(concat('sign:', token)), 1, 7), 16, 10)"
    " as bigint) % 2 * 2 - 1"
)
_FH_S_DUCK = (
    "CAST('0x' || md5('sign:' || token)[1:7] AS BIGINT) % 2 * 2 - 1"
)


@register(
    "q_text_hashing_trick",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS token
            FROM documents WHERE doc_id < {_FH_DOCS}
        )
        SELECT doc_id,
               {_FH_B_DUCK} AS bucket,
               CAST(SUM({_FH_S_DUCK}) AS BIGINT) AS weight
        FROM tok
        GROUP BY doc_id, {_FH_B_DUCK}
        HAVING SUM({_FH_S_DUCK}) <> 0
    """,
    doc=(
        "Feature hashing (the hashing trick / signed hashing "
        "vectorizer): every token hashes to one of 64 fixed buckets "
        "with a +-1 sign from an independent hash, giving "
        "collision-tolerant fixed-width features from an unbounded "
        "vocabulary with NO dictionary to build, broadcast or keep in "
        "sync — the scalable text-featurization baseline (Weinberger "
        "et al. 2009). Zero-weight collisions cancel and drop. One "
        "explode + one partial-aggregable groupBy; the feature table "
        "is (docs x <=64) rows regardless of vocab size."
    ),
    tags=("text", "features", "llm-pipeline"),
)
def q_text_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _FH_DOCS)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("doc_id", F.expr(_FH_B_SPARK).alias("bucket"))
        .agg(F.sum(F.expr(_FH_S_SPARK)).cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


# ---------------------------------------------------------------------------
# Data-quality expectations report
# ---------------------------------------------------------------------------


@register(
    "q_quality_expectations",
    oracle="""
        SELECT 'orders_nonempty' AS rule,
               CAST(COUNT(*) AS BIGINT) AS observed,
               COUNT(*) > 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'orderkey_unique',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               COUNT(*) = COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orders',
               CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'quantity_in_range',
               CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
        FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        UNION ALL
        SELECT 'shipdate_not_null',
               CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
        FROM lineitem WHERE l_shipdate IS NULL
        UNION ALL
        SELECT 'custkey_resolves',
               CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
    """,
    doc=(
        "Deequ-style data-quality expectations report: six named rules "
        "— non-empty table, key uniqueness, two referential-integrity "
        "checks (anti-join orphan counts), a value-range budget and a "
        "null budget — each emitting (rule, observed, passed) into one "
        "verdict table, the gate a nightly pipeline evaluates before "
        "publishing. Every rule is one partial-aggregable scan or one "
        "broadcast/shuffle anti join; the report is six rows regardless "
        "of data size."
    ),
    tags=("quality", "audit", "agg"),
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    def rule(name: str, observed, passed) -> DataFrame:
        return observed.select(
            F.lit(name).alias("rule"),
            F.col("obs").cast("bigint").alias("observed"),
            passed.alias("passed"),
        )

    r3 = rule(
        "lineitem_fk_orders",
        li.join(
            o.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count("*").alias("obs")),
        F.col("obs") == 0,
    )
    r6 = rule(
        "custkey_resolves",
        o.join(
            c.select("c_custkey"),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("obs")),
        F.col("obs") == 0,
    )
    # the four pure-aggregate rules fused into ONE scan of orders and
    # ONE of lineitem (conditional counts), exploded to rows — the
    # prior per-rule union scanned orders 2x and lineitem 3x for them
    # (r11); the two anti-join rules keep their own subtrees
    flat = o.agg(
        F.count("*").alias("o_n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("o_dup"),
    ).crossJoin(
        li.agg(
            F.count(
                F.when(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
                    F.lit(1),
                )
            ).alias("li_range"),
            F.count(F.when(F.col("l_shipdate").isNull(), F.lit(1))).alias(
                "li_nullship"
            ),
        )
    )
    fused = flat.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders_nonempty").alias("rule"),
                    F.col("o_n").cast("bigint").alias("observed"),
                    (F.col("o_n") > 0).alias("passed"),
                ),
                F.struct(
                    F.lit("orderkey_unique").alias("rule"),
                    F.col("o_dup").cast("bigint").alias("observed"),
                    (F.col("o_dup") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("quantity_in_range").alias("rule"),
                    F.col("li_range").cast("bigint").alias("observed"),
                    (F.col("li_range") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("shipdate_not_null").alias("rule"),
                    F.col("li_nullship").cast("bigint").alias("observed"),
                    (F.col("li_nullship") == 0).alias("passed"),
                ),
            )
        ).alias("r")
    ).select("r.rule", "r.observed", "r.passed")
    return fused.unionByName(r3).unionByName(r6)


# ---------------------------------------------------------------------------
# Partition-balance diagnostics
# ---------------------------------------------------------------------------

_PB_N = 32


def _pb_hash(col_sql: str, engine: str) -> str:
    if engine == "spark":
        return (
            f"cast(conv(substring(md5(concat('pb:', cast({col_sql} as string)"
            f")), 1, 7), 16, 10) as bigint) % {_PB_N}"
        )
    return (
        f"CAST('0x' || md5('pb:' || CAST({col_sql} AS VARCHAR))[1:7]"
        f" AS BIGINT) % {_PB_N}"
    )


@register(
    "q_diag_partition_balance",
    oracle=f"""
        WITH by_user AS (
            SELECT {_pb_hash("user_id", "duck")} AS p, COUNT(*) AS c
            FROM events GROUP BY 1
        ),
        by_type AS (
            SELECT {_pb_hash("event_type", "duck")} AS p, COUNT(*) AS c
            FROM events GROUP BY 1
        )
        SELECT 'user_id' AS key_name,
               CAST(COUNT(*) AS BIGINT) AS parts_used,
               CAST(MAX(c) AS BIGINT) AS max_rows,
               CAST(SUM(c) AS BIGINT) AS total_rows,
               ROUND(CAST(MAX(c) AS DOUBLE)
                     / (CAST(SUM(c) AS DOUBLE) / {_PB_N}), 6) AS skew_ratio
        FROM by_user
        UNION ALL
        SELECT 'event_type',
               CAST(COUNT(*) AS BIGINT),
               CAST(MAX(c) AS BIGINT),
               CAST(SUM(c) AS BIGINT),
               ROUND(CAST(MAX(c) AS DOUBLE)
                     / (CAST(SUM(c) AS DOUBLE) / {_PB_N}), 6)
        FROM by_type
    """,
    doc=(
        "Shuffle-design diagnostic: for each candidate partition key, "
        "hash rows into 32 partitions (seeded md5 — engine-stable) and "
        "report partitions used, the hottest partition, and the "
        "max/expected skew ratio — the check run BEFORE choosing a "
        "100 TB shuffle or bucketing key (user_id spreads; a "
        "5-value event_type key can at best fill 5 of 32 partitions "
        "with ~6x skew, which this report makes explicit). One "
        "partial-aggregable groupBy per candidate."
    ),
    tags=("diagnostics", "scale", "agg"),
)
def q_diag_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def profile(key_name: str, col_sql: str) -> DataFrame:
        return (
            e.groupBy(F.expr(_pb_hash(col_sql, "spark")).alias("p"))
            .agg(F.count("*").alias("c"))
            .agg(
                F.lit(key_name).alias("key_name"),
                F.count("*").cast("bigint").alias("parts_used"),
                F.max("c").cast("bigint").alias("max_rows"),
                F.sum("c").cast("bigint").alias("total_rows"),
                F.round(
                    F.max("c").cast("double")
                    / (F.sum("c").cast("double") / _PB_N),
                    6,
                ).alias("skew_ratio"),
            )
        )

    return profile("user_id", "user_id").unionByName(
        profile("event_type", "event_type")
    )


# ---------------------------------------------------------------------------
# Cosine range search
# ---------------------------------------------------------------------------

_RANGE_RADIUS = 0.25
_RANGE_QUERIES = 5


@register(
    "q_sim_range_search",
    oracle=f"""
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND(
                   list_sum(list_transform(range(1, 65),
                       i -> CAST(q.embedding[i] AS DOUBLE)
                            * CAST(v.embedding[i] AS DOUBLE)))
                   / (SQRT(list_sum(list_transform(q.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * SQRT(list_sum(list_transform(v.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                   6) AS cosine
        FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
        WHERE q.vec_id < {_RANGE_QUERIES}
          AND ROUND(
                  list_sum(list_transform(range(1, 65),
                      i -> CAST(q.embedding[i] AS DOUBLE)
                           * CAST(v.embedding[i] AS DOUBLE)))
                  / (SQRT(list_sum(list_transform(q.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                     * SQRT(list_sum(list_transform(v.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                  6) >= {_RANGE_RADIUS}
    """,
    doc=(
        "Cosine range search: every corpus vector within radius "
        "(cosine >= 0.25) of each query — top-k's complement, the "
        "candidate-generation shape dedup and diversity passes use "
        "('give me EVERYTHING this similar', not 'the best k'). The "
        "bounded query set broadcasts against the corpus scan exactly "
        "like q_sim_cosine_topk, but with a radius predicate instead "
        "of a rank window — no per-query state at all, so the scan "
        "parallelizes perfectly at any corpus size. Cosine rounds to "
        "6 dp so the radius comparison is identical on both engines."
    ),
    tags=("similarity", "search"),
)
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _RANGE_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cos = F.round(
        dot_col(F.col("q_emb"), F.col("embedding"))
        / (norm_col(F.col("q_emb")) * norm_col(F.col("embedding"))),
        6,
    )
    return (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= _RANGE_RADIUS)
    )
