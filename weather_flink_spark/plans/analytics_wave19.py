"""Wave-19 operators (round 4): always-valid sequential testing and
log-log price elasticity.

- ``q_stats_msprt`` — mixture sequential probability ratio test
  (mSPRT): the always-valid p-value an experimentation platform
  publishes while an A/B test is STILL RUNNING (peeking-safe, unlike
  the fixed-horizon z-test): per daily checkpoint, cumulative per-arm
  conversion counts feed the normal-mixture likelihood ratio
  Λ = sqrt(V/(V+τ)) · exp(τΔ²/(2V(V+τ))) and p = min(1, 1/Λ),
  monotonically tightening as evidence accumulates.
- ``q_orders_price_elasticity`` — log-log demand regression: per part
  brand, OLS of ln(quantity) on ln(price) over lineitem gives the
  price elasticity of demand (slope), with the LN terms 9dp-quantized
  to DECIMAL before the moment sums (the Zipf-slope discipline) so
  both engines aggregate identical values in any partition order.

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
# Mixture SPRT (always-valid p-values)
# ---------------------------------------------------------------------------

_MS_TAU2 = 0.0001  # mixture variance over the effect prior
_MS_ARM_SPARK = (
    "cast(conv(substring(md5(concat('msprt:', cast(user_id as string))), 1, 7),"
    " 16, 10) as bigint) % 2"
)
_MS_ARM_DUCK = (
    "CAST('0x' || md5('msprt:' || CAST(user_id AS VARCHAR))[1:7] AS BIGINT) % 2"
)


@register(
    "q_stats_msprt",
    oracle=f"""
        WITH first_seen AS (
            -- a user enters the experiment on their first event day and
            -- converts on reaching the heavy-purchaser bar (>= 13
            -- purchases: roughly the corpus median, so both outcomes
            -- occur in both arms)
            SELECT user_id, {_MS_ARM_DUCK} AS arm,
                   CAST(MIN(ts) AS DATE) AS enter_day,
                   CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) >= 13
                        THEN 1 ELSE 0 END AS conv
            FROM events GROUP BY user_id
        ),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
        cum AS (
            SELECT d.d,
                   CAST(SUM(CASE WHEN f.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN f.arm = 0 THEN f.conv ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN f.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN f.arm = 1 THEN f.conv ELSE 0 END) AS BIGINT) AS c_b
            FROM days d JOIN first_seen f ON f.enter_day <= d.d
            GROUP BY d.d
        ),
        stat AS (
            SELECT d, n_a, c_a, n_b, c_b,
                   CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a AS delta,
                   (CAST(c_a AS DOUBLE) / n_a) * (1.0 - CAST(c_a AS DOUBLE) / n_a) / n_a
                   + (CAST(c_b AS DOUBLE) / n_b) * (1.0 - CAST(c_b AS DOUBLE) / n_b) / n_b
                       AS v
            FROM cum WHERE n_a >= 2 AND n_b >= 2
              -- v > 0: at least one arm has a mixed outcome
              AND ((c_a > 0 AND c_a < n_a) OR (c_b > 0 AND c_b < n_b))
        ),
        lam AS (
            SELECT d, n_a, c_a, n_b, c_b,
                   ROUND(delta, 6) AS delta,
                   ROUND(SQRT(v / (v + {_MS_TAU2}))
                         * EXP({_MS_TAU2} * delta * delta
                               / (2.0 * v * (v + {_MS_TAU2}))), 6) AS lambda
            FROM stat
        )
        SELECT d AS checkpoint_day, n_a, c_a, n_b, c_b, delta, lambda,
               ROUND(LEAST(1.0, 1.0 / lambda), 6) AS p_always_valid,
               LEAST(1.0, 1.0 / lambda) < 0.05 AS can_stop
        FROM lam
    """,
    doc=(
        "Mixture sequential probability ratio test (mSPRT, Johari et "
        "al. 2017) — the always-valid p-value an experimentation "
        "platform publishes while the test is STILL RUNNING: unlike "
        "the fixed-horizon z-test, peeking at every daily checkpoint "
        "never inflates false positives. Users enter on their first "
        "event day (seeded md5 arms), cumulative per-arm conversion "
        "counts at each checkpoint feed the normal-mixture likelihood "
        "ratio sqrt(V/(V+tau)) * exp(tau*delta^2 / (2V(V+tau))) and "
        "p = min(1, 1/Lambda). Parity: everything before the one sqrt "
        "and one exp is integer counts and identically-ordered double "
        "ops; lambda rounds to 6 dp. Scale: a distinct-user rollup "
        "plus a days-by-users range join whose left side is the "
        "bounded checkpoint calendar."
    ),
    tags=("statistics", "experimentation"),
)
def q_stats_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("enter_day"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 13
        )
        .cast("int")
        .alias("conv"),
    ).select(F.expr(_MS_ARM_SPARK).alias("arm"), "enter_day", "conv")
    days = e.select(F.col("ts").cast("date").alias("d")).distinct()
    cum = (
        days.join(F.broadcast(first_seen), F.col("enter_day") <= F.col("d"))
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("c_b"),
        )
        .filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        # v > 0: at least one arm has a mixed outcome
        .filter(
            ((F.col("c_a") > 0) & (F.col("c_a") < F.col("n_a")))
            | ((F.col("c_b") > 0) & (F.col("c_b") < F.col("n_b")))
        )
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    delta = rb - ra
    v = ra * (1.0 - ra) / F.col("n_a") + rb * (1.0 - rb) / F.col("n_b")
    lam = F.round(
        F.sqrt(v / (v + _MS_TAU2))
        * F.exp(_MS_TAU2 * delta * delta / (2.0 * v * (v + _MS_TAU2))),
        6,
    )
    p = F.round(F.least(F.lit(1.0), 1.0 / F.col("lambda")), 6)
    return (
        cum.select(
            F.col("d").alias("checkpoint_day"),
            "n_a",
            "c_a",
            "n_b",
            "c_b",
            F.round(delta, 6).alias("delta"),
            lam.alias("lambda"),
        )
        .select(
            "*",
            p.alias("p_always_valid"),
            (F.least(F.lit(1.0), 1.0 / F.col("lambda")) < 0.05).alias(
                "can_stop"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity of demand
# ---------------------------------------------------------------------------

# 9dp-quantized LN terms (the Zipf-slope discipline): transcendental
# outputs become exact decimals BEFORE any order-sensitive aggregation
_LNX_D = "CAST(ROUND(LN(CAST(l_extendedprice AS DOUBLE) / l_quantity), 9) AS DECIMAL(14,9))"
_LNY_D = "CAST(ROUND(LN(CAST(l_quantity AS DOUBLE)), 9) AS DECIMAL(14,9))"
_LNX_S = "cast(round(ln(cast(l_extendedprice as double) / l_quantity), 9) as decimal(14,9))"
_LNY_S = "cast(round(ln(cast(l_quantity as double)), 9) as decimal(14,9))"


@register(
    "q_orders_price_elasticity",
    oracle=f"""
        WITH t AS (
            SELECT p.p_brand AS brand, {_LNX_D} AS x, {_LNY_D} AS y
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_quantity >= 1
        ),
        m AS (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(CAST(x * y AS DECIMAL(28,18))) AS sxy,
                   SUM(CAST(x * x AS DECIMAL(28,18))) AS sxx
            FROM t GROUP BY brand
        )
        SELECT brand, n,
               ROUND((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                     6) AS elasticity,
               ROUND((CAST(sy AS DOUBLE)
                      - ((n * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / n, 6) AS intercept
        FROM m
    """,
    doc=(
        "Price elasticity of demand by part brand: OLS slope of "
        "ln(quantity) on ln(unit price) over lineitem — the log-log "
        "regression whose slope IS the elasticity (a 1% price move "
        "changes demand by slope%). Parity: each LN term quantizes to "
        "9 dp DECIMAL before the exact decimal moment sums (the "
        "q_text_zipf_slope discipline — transcendental values become "
        "order-independent decimals, so partition order cannot drift "
        "the sums), and only the final slope/intercept divisions run "
        "in doubles. One brand-keyed partial-aggregable groupBy behind "
        "a broadcast part join."
    ),
    tags=("statistics", "regression", "agg"),
)
def q_orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 1)
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    t = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.expr(_LNX_S).alias("x"),
        F.expr(_LNY_S).alias("y"),
    )
    m = t.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,18)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,18)")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / nd
    return m.select(
        "brand",
        "n",
        F.round(slope, 6).alias("elasticity"),
        F.round(intercept, 6).alias("intercept"),
    )
