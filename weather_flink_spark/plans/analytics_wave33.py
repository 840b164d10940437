"""Wave-33 operators (round 6, continued): Kaplan-Meier survival and
TOST equivalence testing.

- ``q_stats_kaplan_meier`` — the product-limit survival estimator
  (Kaplan & Meier 1958), completing q_stats_survival_hazard's
  Nelson-Aalen with the estimator practitioners actually plot. The
  float-product problem the Nelson-Aalen docstring flags is solved by
  the LN route with a decimal grid snap: each at-risk factor
  ln(1 - d/n) is computed once, rounded ONCE to DECIMAL(20,12), and
  the running product becomes an EXACT decimal sum over the bounded
  distinct-duration table (broadcast theta join, no partitionless
  window on the Spark side) — order-free, engine-free.
- ``q_stats_tost_equivalence`` — two one-sided tests (Schuirmann 1987)
  for mean equivalence of click vs view values within a +/-5.0
  margin: the A/B question q_stats_welch_ttest cannot answer
  ("is the difference PROVABLY SMALL?" rather than "is it provably
  nonzero?"). Welch moments via the exact-decimal discipline, both
  one-sided normal p-values through the shared Abramowitz-Stegun
  26.2.17 template (identical Horner text on both engines),
  p_tost = max of the two.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Kaplan-Meier product-limit survival
# ---------------------------------------------------------------------------


@register(
    "q_stats_kaplan_meier",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(ts) AS first_ts,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purch_ts,
                   MAX(ts) AS last_ts
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CASE WHEN purch_ts IS NOT NULL
                        THEN date_diff('day', CAST(first_ts AS DATE),
                                       CAST(purch_ts AS DATE))
                        ELSE date_diff('day', CAST(first_ts AS DATE),
                                       CAST(last_ts AS DATE)) END AS dur,
                   CASE WHEN purch_ts IS NOT NULL THEN 1 ELSE 0 END AS death
            FROM per_user
        ),
        durt AS (
            SELECT dur, CAST(SUM(death) AS BIGINT) AS d,
                   CAST(SUM(1 - death) AS BIGINT) AS c
            FROM durs GROUP BY dur
        ),
        risk AS (
            SELECT dur, d, c,
                   CAST(SUM(d + c) OVER (ORDER BY dur DESC) AS BIGINT) AS n_risk
            FROM durt
        ),
        fac AS (
            -- ln(1 - d/n) computed ONCE, snapped ONCE to the decimal
            -- grid: the running product is then an EXACT decimal sum.
            -- d = n_risk means everyone at risk dies: S hits exactly 0
            -- (ln singular) — flagged instead of summed
            SELECT dur, d, c, n_risk,
                   CASE WHEN d > 0 AND d < n_risk
                        THEN CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n_risk),
                                        12) AS DECIMAL(20,12))
                        ELSE CAST(0 AS DECIMAL(20,12)) END AS lnf,
                   CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END AS zf
            FROM risk
        )
        SELECT dur AS duration_days, n_risk, d AS n_death, c AS n_censored,
               CAST(SUM(lnf) OVER (ORDER BY dur ASC) AS DOUBLE)
                   AS ln_survival,
               MAX(zf) OVER (ORDER BY dur ASC) = 1 AS survival_zero
        FROM fac
    """,
    doc=(
        "Kaplan-Meier product-limit survival of time-to-first-purchase "
        "with right censoring (same cohort definition as the "
        "Nelson-Aalen q_stats_survival_hazard — the two estimators "
        "now bracket each other, the textbook pair). The float-product "
        "hazard the NA docstring flags is neutralized: each factor "
        "ln(1 - d/n_risk) is computed once and snapped ONCE to "
        "DECIMAL(20,12), so the running product (= running LN sum) is "
        "an exact decimal accumulation — partition-order-free on any "
        "engine; ln_survival is surfaced rather than exp(ln_survival) "
        "to keep libm exp out of the hashed set. Scale: identical to "
        "NA — one per-user rollup, then a bounded distinct-duration "
        "table where cumulatives are broadcast theta joins on the "
        "Spark side."
    ),
    tags=("statistics", "survival", "events"),
)
def q_stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purch_ts"
        ),
        F.max("ts").alias("last_ts"),
    )
    durs = per_user.select(
        F.when(
            F.col("purch_ts").isNotNull(),
            F.datediff(F.to_date("purch_ts"), F.to_date("first_ts")),
        )
        .otherwise(F.datediff(F.to_date("last_ts"), F.to_date("first_ts")))
        .alias("dur"),
        F.when(F.col("purch_ts").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("death"),
    )
    durt = durs.groupBy("dur").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.sum(1 - F.col("death")).cast("bigint").alias("c"),
    )
    b = durt.select(
        F.col("dur").alias("bdur"),
        F.col("d").alias("bd"),
        F.col("c").alias("bc"),
    )
    risk = (
        durt.join(F.broadcast(b), F.col("bdur") >= F.col("dur"))
        .groupBy("dur", "d", "c")
        .agg(F.sum(F.col("bd") + F.col("bc")).alias("n_risk"))
    )
    fac = risk.withColumn(
        "lnf",
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
                12,
            ).cast("decimal(20,12)"),
        ).otherwise(F.lit(0).cast("decimal(20,12)")),
    ).withColumn(
        "zf",
        F.when(
            (F.col("d") > 0) & (F.col("d") == F.col("n_risk")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    fb = fac.select(
        F.col("dur").alias("bdur"),
        F.col("lnf").alias("blnf"),
        F.col("zf").alias("bzf"),
    )
    cum = (
        fac.join(F.broadcast(fb), F.col("bdur") <= F.col("dur"))
        .groupBy("dur", "d", "c", "n_risk")
        .agg(F.sum("blnf").alias("lnS"), F.max("bzf").alias("zmax"))
    )
    return cum.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_death"),
        F.col("c").alias("n_censored"),
        F.col("lnS").cast("double").alias("ln_survival"),
        (F.col("zmax") == 1).alias("survival_zero"),
    )


# ---------------------------------------------------------------------------
# TOST equivalence test (click vs view means, margin +/- 5.0)
# ---------------------------------------------------------------------------

_TOST_A = "click"
_TOST_B = "view"
_TOST_MARGIN = 5.0
_TOST_ALPHA = 0.05

# one-sided upper-tail p = 1 - Phi(z) via Abramowitz-Stegun 26.2.17
# (the q_stats_benjamini_hochberg template, one-sided form); rendered
# as ONE text into both engines so every double op matches.
_TOST_P1 = (
    "CASE WHEN {z} >= 0.0 THEN ROUND("
    "0.3989422804014327 * EXP(-0.5 * {z} * {z})"
    " * (1.0 / (1.0 + 0.2316419 * {z}))"
    " * (0.319381530 + (1.0 / (1.0 + 0.2316419 * {z})) * (-0.356563782"
    " + (1.0 / (1.0 + 0.2316419 * {z})) * (1.781477937"
    " + (1.0 / (1.0 + 0.2316419 * {z})) * (-1.821255978"
    " + (1.0 / (1.0 + 0.2316419 * {z})) * 1.330274429)))), 6)"
    " ELSE ROUND(1.0 - "
    "0.3989422804014327 * EXP(-0.5 * (-{z}) * (-{z}))"
    " * (1.0 / (1.0 + 0.2316419 * (-{z})))"
    " * (0.319381530 + (1.0 / (1.0 + 0.2316419 * (-{z}))) * (-0.356563782"
    " + (1.0 / (1.0 + 0.2316419 * (-{z}))) * (1.781477937"
    " + (1.0 / (1.0 + 0.2316419 * (-{z}))) * (-1.821255978"
    " + (1.0 / (1.0 + 0.2316419 * (-{z}))) * 1.330274429)))), 6) END"
)


@register(
    "q_stats_tost_equivalence",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(value AS DECIMAL(14,6))) AS s,
                   SUM(CAST(value AS DECIMAL(14,6))
                       * CAST(value AS DECIMAL(14,6))) AS ss
            FROM events
            WHERE event_type IN ('{_TOST_A}', '{_TOST_B}')
            GROUP BY event_type
        ),
        piv AS (
            SELECT
                MAX(CASE WHEN event_type = '{_TOST_A}' THEN n END) AS na,
                MAX(CASE WHEN event_type = '{_TOST_A}' THEN s END) AS sa,
                MAX(CASE WHEN event_type = '{_TOST_A}' THEN ss END) AS ssa,
                MAX(CASE WHEN event_type = '{_TOST_B}' THEN n END) AS nb,
                MAX(CASE WHEN event_type = '{_TOST_B}' THEN s END) AS sb,
                MAX(CASE WHEN event_type = '{_TOST_B}' THEN ss END) AS ssb
            FROM m
        ),
        stat AS (
            SELECT na, nb,
                   ROUND(CAST(sa AS DOUBLE) / na
                         - CAST(sb AS DOUBLE) / nb, 6) AS diff,
                   ROUND(SQRT(
                       ROUND((CAST(ssa AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
                             / (na - 1.0), 6) / na
                       + ROUND((CAST(ssb AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
                               / (nb - 1.0), 6) / nb), 6) AS se
            FROM piv
        ),
        zs AS (
            SELECT na, nb, diff, se,
                   ROUND((diff + {_TOST_MARGIN}) / se, 6) AS z_lower,
                   ROUND(({_TOST_MARGIN} - diff) / se, 6) AS z_upper
            FROM stat
        ),
        ps AS (
            SELECT na, nb, diff, se, z_lower, z_upper,
                   {_TOST_P1.format(z='z_lower')} AS p_lower,
                   {_TOST_P1.format(z='z_upper')} AS p_upper
            FROM zs
        )
        SELECT na, nb, diff, se, z_lower, z_upper, p_lower, p_upper,
               CASE WHEN p_lower > p_upper THEN p_lower ELSE p_upper END
                   AS p_tost,
               (CASE WHEN p_lower > p_upper THEN p_lower ELSE p_upper END)
                   < {_TOST_ALPHA} AS equivalent
        FROM ps
    """,
    doc=(
        f"TOST equivalence test (Schuirmann 1987): are '{_TOST_A}' and "
        f"'{_TOST_B}' mean values equivalent within ±{_TOST_MARGIN}? "
        "The question q_stats_welch_ttest cannot answer — failing to "
        "reject a difference is NOT evidence of equivalence; TOST "
        "inverts the burden with two one-sided tests against the "
        "margin ends, p_tost = max of the two. Moments via the exact-"
        "decimal Welch discipline (BH's z construction), one-sided "
        "normal p through the shared Abramowitz-Stegun 26.2.17 Horner "
        "template rendered into BOTH engines (6 dp round absorbs "
        "cross-libm exp ulps). Scale: one conditional-aggregation "
        "pass, then model-sized math."
    ),
    tags=("stats", "ab-testing", "equivalence"),
)
def q_stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(_TOST_A, _TOST_B)
    )
    dec = F.col("value").cast("decimal(14,6)")
    m = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    piv = m.agg(
        *[
            agg
            for t, tag in ((_TOST_A, "a"), (_TOST_B, "b"))
            for agg in (
                F.max(F.when(F.col("event_type") == t, F.col("n"))).alias(
                    f"n{tag}"
                ),
                F.max(F.when(F.col("event_type") == t, F.col("s"))).alias(
                    f"s{tag}"
                ),
                F.max(F.when(F.col("event_type") == t, F.col("ss"))).alias(
                    f"ss{tag}"
                ),
            )
        ]
    )
    na, nb = F.col("na"), F.col("nb")
    diff = F.round(
        F.col("sa").cast("double") / na - F.col("sb").cast("double") / nb, 6
    )
    var_a = F.round(
        (
            F.col("ssa").cast("double")
            - F.col("sa").cast("double") * F.col("sa").cast("double") / na
        )
        / (na - F.lit(1.0)),
        6,
    )
    var_b = F.round(
        (
            F.col("ssb").cast("double")
            - F.col("sb").cast("double") * F.col("sb").cast("double") / nb
        )
        / (nb - F.lit(1.0)),
        6,
    )
    se = F.round(F.sqrt(var_a / na + var_b / nb), 6)
    zs = piv.select(
        "na",
        "nb",
        diff.alias("diff"),
        se.alias("se"),
    ).select(
        "na",
        "nb",
        "diff",
        "se",
        F.round((F.col("diff") + _TOST_MARGIN) / F.col("se"), 6).alias(
            "z_lower"
        ),
        F.round((F.lit(_TOST_MARGIN) - F.col("diff")) / F.col("se"), 6).alias(
            "z_upper"
        ),
    )
    ps = zs.select(
        "*",
        F.expr(_TOST_P1.format(z="z_lower")).alias("p_lower"),
        F.expr(_TOST_P1.format(z="z_upper")).alias("p_upper"),
    )
    p_tost = F.when(
        F.col("p_lower") > F.col("p_upper"), F.col("p_lower")
    ).otherwise(F.col("p_upper"))
    return ps.select(
        "*",
        p_tost.alias("p_tost"),
        (p_tost < _TOST_ALPHA).alias("equivalent"),
    )
