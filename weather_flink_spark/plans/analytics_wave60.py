"""Wave-60 operator (round 9): exact Shapley-value multi-touch
attribution — the third credit-split model beside last-touch
(q_events_attribution) and Markov removal effects
(q_events_attribution_markov).

``q_events_attribution_shapley`` (Shapley 1953; the cooperative-game
attribution of Dalessandro et al. 2012 / Zhao et al. 2018): user
journeys (the wave-45 rule — ``purchase`` converts and RESTARTS the
journey) define a game over the CHANNEL SET: a journey's touch set is
the distinct non-conversion channels it visited, and a coalition S of
channels "covers" every converted journey whose touch set is a subset
of S, so

    v(S) = #conversions from journeys with touch_set ⊆ S
    phi_c = sum over S ⊆ N\\{c} of |S|!(k-1-|S|)!/k! * [v(S+c) - v(S)]

computed EXACTLY by subset enumeration — no permutation sampling.

Scale posture: the exponential 2^k lives ONLY on bounded sides.
Journeys collapse to a 64-bit channel BITMASK per journey (one
groupBy), masks aggregate to <= 2^k rows (a second groupBy), and the
subset lattice (2^k rows), the v(S) containment join (2^k x 2^k), and
the marginal join are all broadcast-bounded model-side work —
independent of corpus size, exactly like the k-means model builds.
Real Shapley attribution is exponential in channels by nature;
production caps the channel set (top-k + OTHER), which this plan
inherits by construction (k = distinct channels; 4 in the fixture).
The one driver-side value is k itself (a bounded count, the kmeans-k
convention).

Exactness: v, marginals, and the |S|!(k-1-|S|)!-weighted sums are all
BIGINT integer arithmetic (both engines' ``factorial`` is exact for
small k); doubles appear only in the final two divisions
(phi = weighted_sum / k!, share = weighted_sum_c / total) — identical
IEEE operations on identical integers on both engines.

Efficiency property (tested): sum(phi) == v(N) - v(empty), the
Shapley efficiency axiom — empty-touch conversions (purchase with no
prior touches) are exactly the credit no channel can claim.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_CONV = "purchase"


def _shapley_oracle() -> str:
    return f"""
        WITH chan AS MATERIALIZED (
            SELECT event_type AS channel,
                   CAST(ROW_NUMBER() OVER (ORDER BY event_type ASC) - 1
                        AS INTEGER) AS bit
            FROM (SELECT DISTINCT event_type FROM events
                  WHERE event_type <> '{_CONV}')
        ),
        kk AS (SELECT CAST(COUNT(*) AS INTEGER) AS k FROM chan),
        ev AS (
            SELECT user_id, event_type,
                   CAST(COALESCE(SUM(CASE WHEN event_type = '{_CONV}'
                                          THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS jid
            FROM events
        ),
        journeys AS (
            SELECT e.user_id, e.jid,
                   CAST(COALESCE(BIT_OR(CASE WHEN c.bit IS NOT NULL
                            THEN CAST(1 AS BIGINT) << c.bit END), 0)
                        AS BIGINT) AS mask,
                   MAX(CASE WHEN e.event_type = '{_CONV}'
                            THEN 1 ELSE 0 END) AS conv
            FROM ev e
            LEFT JOIN chan c ON c.channel = e.event_type
            GROUP BY e.user_id, e.jid
        ),
        mask_conv AS (
            SELECT mask, CAST(SUM(conv) AS BIGINT) AS n_conv
            FROM journeys GROUP BY mask
        ),
        subsets AS (
            SELECT CAST(UNNEST(range(0, 1 << (SELECT k FROM kk)))
                        AS BIGINT) AS s
        ),
        v AS MATERIALIZED (
            SELECT s.s,
                   CAST(COALESCE(SUM(m.n_conv), 0) AS BIGINT) AS v
            FROM subsets s
            LEFT JOIN mask_conv m ON (m.mask & s.s) = m.mask
            GROUP BY s.s
        ),
        phi AS (
            SELECT c.channel,
                   CAST(SUM(factorial(bit_count(v1.s))
                            * factorial((SELECT k FROM kk) - 1
                                        - bit_count(v1.s))
                            * (v2.v - v1.v)) AS BIGINT) AS wsum
            FROM chan c
            JOIN v v1 ON (v1.s & (CAST(1 AS BIGINT) << c.bit)) = 0
            JOIN v v2 ON v2.s = (v1.s | (CAST(1 AS BIGINT) << c.bit))
            GROUP BY c.channel
        )
        SELECT channel,
               CAST(wsum AS DOUBLE)
                   / CAST(factorial((SELECT k FROM kk)) AS DOUBLE)
                   AS shapley_value,
               CASE WHEN (SELECT SUM(wsum) FROM phi) = 0 THEN 0.0
                    ELSE CAST(wsum AS DOUBLE)
                         / CAST((SELECT SUM(wsum) FROM phi) AS DOUBLE)
               END AS share
        FROM phi
    """


@register(
    "q_events_attribution_shapley",
    oracle=_shapley_oracle(),
    doc=(
        "Exact Shapley-value multi-touch attribution (r9) — the "
        "game-theoretic credit split beside last-touch and Markov "
        "removal: v(S) = conversions from journeys whose distinct-"
        "channel touch set is covered by coalition S (purchase "
        "restarts the journey, the wave-45 rule), phi by EXACT subset "
        "enumeration with |S|!(k-1-|S|)!/k! weights — no permutation "
        "sampling. Journeys collapse to 64-bit channel bitmasks (one "
        "groupBy), masks to <= 2^k rows (another), and the whole "
        "subset lattice / containment join / marginal join is "
        "broadcast-bounded model work independent of corpus size "
        "(production caps channels, which the plan inherits; the "
        "efficiency axiom sum(phi) = v(N) - v(empty) is tested). All "
        "integer arithmetic until the final two divisions. Oracle "
        "replays masks, the lattice, and the weighted sums in pure "
        "integer SQL."
    ),
    tags=("events", "attribution", "shapley", "analytics"),
)
def q_events_attribution_shapley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # the channel set is the bounded model constant (kmeans-k
    # convention): ONE bounded collect assigns bits driver-side —
    # never a partitionless window, even over this tiny frame (the
    # scale net rightly can't tell tiny from data-sized)
    channels = sorted(
        r[0]
        for r in e.filter(F.col("event_type") != _CONV)
        .select("event_type")
        .distinct()
        .collect()
    )
    k = len(channels)
    # Spark's factorial() returns NULL past 20!, which would silently
    # null the weighted sums instead of failing loudly; production
    # journeys cap channels via top-k+OTHER (docstring) — enforce it
    if k > 20:
        raise ValueError(
            f"q_events_attribution_shapley: {k} distinct channels > 20 "
            "(factorial overflow); cap channels upstream with the "
            "top-k+OTHER convention described in the docstring"
        )
    chan = spark.createDataFrame(
        [(c, i) for i, c in enumerate(channels)], "channel string, bit int"
    )

    w_jid = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = e.select(
        "user_id",
        "event_type",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == _CONV, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).over(w_jid),
            F.lit(0),
        ).cast("bigint").alias("jid"),
    )
    journeys = (
        ev.join(F.broadcast(chan), ev.event_type == chan.channel, "left")
        .groupBy("user_id", "jid")
        .agg(
            F.coalesce(
                F.bit_or(
                    F.when(
                        F.col("bit").isNotNull(),
                        F.expr("shiftleft(CAST(1 AS BIGINT), bit)"),
                    )
                ),
                F.lit(0).cast("bigint"),
            ).alias("mask"),
            F.max(
                F.when(F.col("event_type") == _CONV, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("conv"),
        )
    )
    mask_conv = journeys.groupBy("mask").agg(
        F.sum("conv").cast("bigint").alias("n_conv")
    )
    subsets = spark.range(1 << k).select(F.col("id").alias("s"))
    v = (
        subsets.join(
            F.broadcast(mask_conv),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("bigint").alias("v"))
    )
    cbit = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("vs"))
    v2 = v.select(F.col("s").alias("s2"), F.col("v").alias("vsc"))
    phi = (
        F.broadcast(chan)
        .join(v1, (F.col("s1").bitwiseAND(cbit) == 0))
        .join(v2, F.col("s2") == F.col("s1").bitwiseOR(cbit))
        .groupBy("channel")
        .agg(
            F.sum(
                F.factorial(F.bit_count(F.col("s1")))
                * F.factorial(F.lit(k - 1) - F.bit_count(F.col("s1")))
                * (F.col("vsc") - F.col("vs"))
            ).cast("bigint").alias("wsum")
        )
    )
    total = phi.agg(F.sum("wsum").cast("bigint").alias("t"))
    kfact = phi.select(
        "channel",
        "wsum",
        F.factorial(F.lit(k)).cast("bigint").alias("kf"),
    )
    return kfact.crossJoin(F.broadcast(total)).select(
        "channel",
        (F.col("wsum").cast("double") / F.col("kf").cast("double")).alias(
            "shapley_value"
        ),
        F.when(F.col("t") == 0, F.lit(0.0))
        .otherwise(F.col("wsum").cast("double") / F.col("t").cast("double"))
        .alias("share"),
    )
