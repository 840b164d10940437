"""Wave-48 operator (round 7): PPS systematic sampling.

- ``q_sample_pps_systematic`` — probability-proportional-to-size
  SYSTEMATIC sampling (Madow 1949, the survey-sampling workhorse
  behind "sample customers proportionally to revenue"): lay every
  unit's integer weight end-to-end on a line (the distributed prefix
  sum over custkey order), drop n equally-spaced sample points from a
  seeded deterministic start u in (0, W/n] (no cyclic wrap: all n
  points land inside (0, W]), and select each unit once per point
  landing in its interval — exactly n draws, always. Completes the sampling family's design
  space: reservoir (uniform streaming), stratified/Neyman (allocation
  across groups), Horvitz-Thompson (estimation under unequal p),
  temperature/DoReMi/DSIR (corpus reweighting), k-center (coverage) —
  this one is the fixed-size unequal-probability DRAW.

  Parity: weights are exact integer CENTS; the point-count in an
  interval is floor((c·n − u·n + W)/W) − floor((prev·n − u·n + W)/W)
  — all BIGINT (cum·n ≤ ~2e12 at sf0.1; the +W keeps operands
  positive so DuckDB's floor-div and Spark's truncating div agree),
  with u = 1 + seeded-md5 mod (W div n) (never rand()); the global cumulative weight comes from
  operators/global_order.attach_prefix_sum (two-pass, bit-identical
  to the oracle's single-partition window because integer addition is
  associative) — the Spark plan has NO partitionless window.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_PPS_N = 100  # sample points (expected draws; big units can take several)

# seeded offset nonce: md5('pps:offset') -> 28-bit int, taken mod W at
# runtime on both engines (the repo's never-rand() discipline)
_PPS_SEED_SPARK = (
    "cast(conv(substring(md5('pps:offset'), 1, 7), 16, 10) as bigint)"
)
_PPS_SEED_DUCK = (
    "CAST(('0x' || substring(md5('pps:offset'), 1, 7))::UBIGINT AS BIGINT)"
)


@register(
    "q_sample_pps_systematic",
    oracle=f"""
        WITH w AS (
            SELECT o_custkey AS custkey,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                              * 100, 0) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        cum AS (
            SELECT custkey, cents,
                   SUM(cents) OVER (ORDER BY custkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS c
            FROM w
        ),
        tot AS (
            -- start u in (0, W/n]: points u + m*W/n, m = 0..n-1, all
            -- land inside (0, W] — no cyclic wrap, exactly n draws
            SELECT MAX(c) AS wtot,
                   1 + {_PPS_SEED_DUCK} % (MAX(c) // {_PPS_N}) AS u
            FROM cum
        ),
        hits AS (
            -- point m in (prev, c] <=> prev*n < u*n + m*W <= c*n:
            -- count = floor((c*n - u*n + W)/W) - floor((p*n - u*n + W)/W),
            -- the +W keeping every operand positive so // (floor) and
            -- Spark's div (truncate) agree
            SELECT custkey, cents,
                   (c * {_PPS_N} - u * {_PPS_N} + wtot) // wtot
                   - ((c - cents) * {_PPS_N} - u * {_PPS_N} + wtot) // wtot
                       AS n_hits
            FROM cum CROSS JOIN tot
        )
        SELECT custkey, cents, CAST(n_hits AS BIGINT) AS n_hits
        FROM hits WHERE n_hits > 0
    """,
    doc=(
        "PPS systematic sampling (Madow 1949): customers sampled "
        "proportionally to exact integer revenue CENTS — n=100 "
        "equally-spaced points over the cumulative-weight line from a "
        "seeded-md5 start u in (0, W/n] (never rand(); no cyclic "
        "wrap — exactly n draws); a unit is drawn once per "
        "point in its interval (n_hits ≥ 1; whales can take several — "
        "the with-replacement characteristic of systematic PPS). "
        "Parity: point counts are pure BIGINT division with a +W shift "
        "keeping operands positive (floor-div == truncating div); "
        "the global cumsum "
        "is the two-pass distributed prefix-sum primitive "
        "(operators/global_order) — integer addition is associative, "
        "so it is bit-identical to the oracle's single-partition "
        "window and the Spark plan has NO partitionless window. "
        "Scale: one range partition + one tiny offsets broadcast."
    ),
    tags=("sampling", "statistics", "global-order"),
)
def q_sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.global_order import attach_prefix_sum

    o = load(spark, sf_dir, "orders")
    w = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100, 0
        )
        .cast("bigint")
        .alias("cents")
    )
    cum = attach_prefix_sum(
        w, [F.col("custkey").asc()], "cents", "c"
    )
    tot = cum.agg(
        F.max("c").alias("wtot"),
        (
            F.lit(1)
            + F.expr(_PPS_SEED_SPARK)
            % F.expr(f"max(c) div {_PPS_N}")
        ).alias("u"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    hits_hi = F.expr(
        f"(c * {_PPS_N} - u * {_PPS_N} + wtot) div wtot"
    )
    hits_lo = F.expr(
        f"((c - cents) * {_PPS_N} - u * {_PPS_N} + wtot) div wtot"
    )
    return (
        j.select(
            "custkey",
            "cents",
            (hits_hi - hits_lo).cast("bigint").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )
