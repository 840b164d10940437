"""Wave-61 operator (round 9): split conformal prediction intervals —
distribution-free uncertainty for a fitted regression, the standard
finite-sample-guaranteed interval (Vovk et al. 2005; Lei et al. 2018).

``q_stats_conformal_interval``: a seeded-md5 60/20/20 split of
lineitem (the engine's never-rand() split rule) fits OLS
extendedprice ~ quantity on TRAIN (the wave-3 decimal-exact
closed form), takes q_hat = the ceil((n_cal+1)*(1-alpha))-th smallest
absolute calibration residual (an EXACT order statistic — the split
conformal quantile, which guarantees P(|y - yhat| <= q_hat) >=
1 - alpha on exchangeable data regardless of model quality), and
reports empirical coverage of the band yhat ± q_hat on the held-out
TEST split. One summary row: split sizes, the (rounded) fitted
coefficients, q_hat, and test coverage — the guarantee itself is
asserted in tests (coverage >= 1 - alpha - slack).

Scale: the fit is one partial-aggregated groupBy (decimal-exact sums);
the calibration order statistic rides the two-pass range-partitioned
global row number (operators/global_order — never a partitionless
window over the data-sized calibration set); the broadcast 1-row model
and 1-row q_hat price the scoring passes as pure narrow maps.

Parity: coefficients round to 6dp BEFORE residuals are computed, so
every residual is the same IEEE arithmetic on the same rounded doubles
on both engines; the rank index is pure integer arithmetic
(ceil((n+1)*(1-alpha)) with alpha = 1/10 exact as (9*(n+1)+9)//10).

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

_ALPHA_NUM, _ALPHA_DEN = 1, 10  # alpha = 0.1 as an exact rational

_BUCKET_SPARK = (
    "cast(conv(substring(md5(concat('conf:', cast(l_orderkey as string), ':',"
    " cast(l_linenumber as string))), 1, 7), 16, 10) as bigint) % 100"
)
_BUCKET_DUCK = (
    "CAST('0x' || md5('conf:' || CAST(l_orderkey AS VARCHAR) || ':'"
    " || CAST(l_linenumber AS VARCHAR))[1:7] AS BIGINT) % 100"
)


def _conformal_oracle() -> str:
    return f"""
        WITH base AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS DOUBLE) AS x,
                   CAST(l_extendedprice AS DOUBLE) AS y,
                   {_BUCKET_DUCK} AS bucket
            FROM lineitem
        ),
        m AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))
                          * CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))
                          * CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sxx
            FROM lineitem
            WHERE {_BUCKET_DUCK} < 60
        ),
        fit AS (
            SELECT ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
                   ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                     / CAST(n AS DOUBLE), 6) AS intercept,
                   n AS n_train
            FROM m
        ),
        cal AS (
            SELECT b.l_orderkey, b.l_linenumber,
                   ABS(b.y - (f.intercept + f.slope * b.x)) AS ar
            FROM base b CROSS JOIN fit f
            WHERE b.bucket >= 60 AND b.bucket < 80
        ),
        ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
        qhat AS (
            SELECT ar AS q_hat FROM (
                SELECT ar, ROW_NUMBER() OVER (
                    ORDER BY ar ASC, l_orderkey ASC, l_linenumber ASC) AS rn
                FROM cal
            )
            WHERE rn = ({_ALPHA_DEN - _ALPHA_NUM}
                        * ((SELECT n_cal FROM ncal) + 1)
                        + {_ALPHA_DEN - 1}) // {_ALPHA_DEN}
        ),
        test AS (
            SELECT COUNT(*) AS n_test,
                   CAST(SUM(CASE WHEN ABS(b.y - (f.intercept + f.slope * b.x))
                                      <= (SELECT q_hat FROM qhat)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
            FROM base b CROSS JOIN fit f
            WHERE b.bucket >= 80
        )
        SELECT CAST({_ALPHA_NUM} AS DOUBLE) / {_ALPHA_DEN} AS alpha,
               f.n_train, (SELECT n_cal FROM ncal) AS n_cal,
               t.n_test, f.slope, f.intercept,
               ROUND((SELECT q_hat FROM qhat), 6) AS q_hat,
               t.n_covered,
               CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE)
                   AS coverage
        FROM fit f CROSS JOIN test t
    """


@register(
    "q_stats_conformal_interval",
    oracle=_conformal_oracle(),
    doc=(
        "Split conformal prediction interval (r9): seeded-md5 60/20/20 "
        "split, decimal-exact OLS on train, q_hat = the "
        "ceil((n_cal+1)*(1-alpha))-th smallest absolute calibration "
        "residual (EXACT order statistic via the two-pass "
        "range-partitioned global row number — never a partitionless "
        "window), empirical coverage of yhat ± q_hat on the held-out "
        "test split. The distribution-free finite-sample guarantee "
        "P(covered) >= 1-alpha is asserted in tests. Coefficients "
        "round to 6dp before residuals so both engines run identical "
        "IEEE arithmetic; the rank index is exact integer math."
    ),
    tags=("stats", "conformal", "uncertainty", "ml-eval"),
)
def q_stats_conformal_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    # the 1-row summary doubles as the (slope, intercept, q_hat) model
    # the wave-65 streaming scorer serves — session-cache it like the
    # searcher results so consumers never re-pay the fit + global rank
    return _cached(
        "conformal_result",
        spark,
        sf_dir,
        lambda: _conformal_build(spark, sf_dir).transform(snapshot()),
    )


def _conformal_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.global_order import (
        attach_global_row_number,
    )

    li = load(spark, sf_dir, "lineitem")
    bucket = F.expr(_BUCKET_SPARK)
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
        bucket.alias("bucket"),
    )
    xd = F.col("l_quantity").cast("decimal(12,6)")
    yd = F.col("l_extendedprice").cast("decimal(16,6)")
    m = li.filter(bucket < 60).agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope_raw = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    # the 1-row model, order statistic, and count are each consumed by
    # several downstream branches — localCheckpoint so the train
    # aggregation and the two-pass global rank run ONCE, not once per
    # consumer (measured: 5.1 -> ~2 s at sf0.1)
    fit = m.select(
        F.round(slope_raw, 6).alias("slope"),
        F.round((F.col("sy") - slope_raw * F.col("sx")) / nd, 6).alias(
            "intercept"
        ),
        F.col("n").alias("n_train"),
    ).transform(snapshot())
    resid = F.abs(F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")))
    cal = (
        base.filter((F.col("bucket") >= 60) & (F.col("bucket") < 80))
        .crossJoin(F.broadcast(fit.select("slope", "intercept")))
        .select("l_orderkey", "l_linenumber", resid.alias("ar"))
    )
    n_cal = cal.agg(F.count("*").cast("bigint").alias("n_cal")).transform(snapshot())
    # degenerate-input guard: if the calibration split is smaller than
    # the conformal rank index ceil((den-num)(n+1)/den) (n_cal < 9 at
    # alpha=0.1), the qhat frame would be empty and the Spark side
    # would emit 0 rows while the oracle's scalar subquery emits one
    # NULL-q_hat row — fail loudly instead of diverging silently
    n_cal_val = int(n_cal.first()["n_cal"])
    rank_needed = (
        (_ALPHA_DEN - _ALPHA_NUM) * (n_cal_val + 1) + _ALPHA_DEN - 1
    ) // _ALPHA_DEN
    if rank_needed > n_cal_val:
        raise ValueError(
            f"q_stats_conformal_interval: calibration split has "
            f"{n_cal_val} rows but the alpha={_ALPHA_NUM}/{_ALPHA_DEN} "
            f"conformal quantile needs rank {rank_needed}; supply at "
            f"least {rank_needed} calibration rows"
        )
    ranked = attach_global_row_number(
        cal,
        [F.col("ar").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        out_col="rn",
    )
    rank_idx = (
        F.lit(_ALPHA_DEN - _ALPHA_NUM) * (F.col("n_cal") + 1)
        + F.lit(_ALPHA_DEN - 1)
    ).cast("bigint") / F.lit(_ALPHA_DEN)
    qhat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .filter(F.col("rn") == F.floor(rank_idx))
        .select(F.col("ar").alias("q_hat"))
        .transform(snapshot())
    )
    test = (
        base.filter(F.col("bucket") >= 80)
        .crossJoin(F.broadcast(fit.select("slope", "intercept")))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(resid <= F.col("q_hat"), F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("n_covered"),
        )
    )
    return (
        fit.crossJoin(F.broadcast(n_cal))
        .crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(test))
        .select(
            (F.lit(float(_ALPHA_NUM)) / F.lit(_ALPHA_DEN)).alias("alpha"),
            "n_train",
            "n_cal",
            "n_test",
            "slope",
            "intercept",
            F.round(F.col("q_hat"), 6).alias("q_hat"),
            "n_covered",
            (
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )
