"""Wave-45 operator (round 7): Markov removal-effect attribution.

- ``q_events_attribution_markov`` — data-driven multi-touch
  attribution (Anderl et al. 2016, the "Markov chain attribution"
  industry standard): user journeys form a first-order chain over
  channels (``purchase`` converts and RESTARTS the journey — the next
  event's predecessor becomes START; a journey that ends without
  converting falls into the NULL absorb END). Compute the probability
  of converting within L=3 hops from START, then for each channel the
  REMOVAL EFFECT — how much conversion drops when that channel's
  visits become dropouts — normalized into attribution shares.
  Complements q_events_attribution (last-touch heuristic) and
  q_events_entropy_rate (the same matrix's information summary) with
  the causal-flavored credit split.

  Removal semantics: removing channel c redirects every transition
  INTO c to the NULL absorb — algebraically identical to forcing
  p_k(c) = 0 in the hop recursion (entering c contributes
  P(s→c)·p(c) = 0), so ALL removals compute in ONE plan: the hop
  recursion is keyed by (removal_candidate, state), with candidate
  __NONE__ giving the baseline.

  Parity discipline (the wave-27 scaled-integer lesson): each
  transition probability c_st/c_s snaps ONCE to a 1e6-scaled BIGINT;
  each hop is Σ P6·p6 (per term ≤ 1e12, summed over a bounded state
  set — BIGINT-safe by construction) followed by TRUNCATING integer
  division by 1e6 (identical on both engines for non-negatives), so
  all hops are exact integer arithmetic; doubles appear only in the
  final effect/share ratios. Absorbing states (purchase = SCALE,
  END = 0) are re-unioned after every hop — the groupBy over edge
  sources would otherwise silently drop them from hop k+1's lookup.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_CONV = "purchase"
_HOPS = 3
_SCALE = 1_000_000  # probability fixed-point scale (1e6)


def _transitions_cte() -> str:
    """DuckDB CTE chain ending in ``trans`` (src, dst, p6): the
    START-prefixed, END-suffixed, conversion-restarted journey
    transition matrix with 1e6-scaled integer probabilities."""
    return f"""
        seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER w AS prev_raw,
                   LEAD(event_type) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        moves AS (
            -- journey start AND post-conversion restart map to START;
            -- non-converting journey ends emit the END absorb edge
            SELECT CASE WHEN prev_raw IS NULL OR prev_raw = '{_CONV}'
                        THEN '__START__' ELSE prev_raw END AS src,
                   event_type AS dst
            FROM seq
            UNION ALL
            SELECT event_type AS src, '__END__' AS dst FROM seq
            WHERE next_type IS NULL AND event_type <> '{_CONV}'
        ),
        c AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cst
            FROM moves GROUP BY src, dst
        ),
        cs AS (
            SELECT src, CAST(SUM(cst) AS BIGINT) AS ctot FROM c GROUP BY src
        ),
        trans AS (
            SELECT c.src, c.dst,
                   CAST(ROUND(CAST(c.cst AS DOUBLE) / cs.ctot * {_SCALE}, 0)
                        AS BIGINT) AS p6
            FROM c JOIN cs ON cs.src = c.src
        )"""


def _attribution_oracle() -> str:
    hops = []
    prev = "p0"
    for k in range(1, _HOPS + 1):
        hops.append(f"""
        p{k} AS (
            SELECT r, s, p6 FROM (
                SELECT r.r AS r, t.src AS s,
                       CASE WHEN t.src = r.r THEN 0
                            ELSE SUM(t.p6 * p.p6) // {_SCALE}
                       END AS p6
                FROM trans t
                CROSS JOIN removals r
                JOIN {prev} p ON p.r = r.r AND p.s = t.dst
                GROUP BY r.r, t.src
            )
            UNION ALL
            SELECT r.r, a.s, a.p6 FROM removals r CROSS JOIN absorb a
        )""")
        prev = f"p{k}"
    hop_sql = ",".join(hops)
    return f"""
        WITH {_transitions_cte()},
        channels AS (
            SELECT DISTINCT event_type AS ch FROM events
            WHERE event_type <> '{_CONV}'
        ),
        removals AS (
            SELECT ch AS r FROM channels UNION ALL SELECT '__NONE__'
        ),
        absorb AS (
            SELECT * FROM (VALUES ('{_CONV}', CAST({_SCALE} AS BIGINT)),
                                  ('__END__', CAST(0 AS BIGINT))) v(s, p6)
        ),
        srcs AS (SELECT DISTINCT src AS s FROM trans),
        p0 AS (
            SELECT r.r, s.s, CAST(0 AS BIGINT) AS p6
            FROM srcs s CROSS JOIN removals r
            UNION ALL
            SELECT r.r, a.s, a.p6 FROM removals r CROSS JOIN absorb a
        ),
        {hop_sql},
        base AS (
            SELECT CAST(p6 AS BIGINT) AS conv6 FROM p{_HOPS}
            WHERE r = '__NONE__' AND s = '__START__'
        ),
        removed AS (
            SELECT r AS channel, CAST(p6 AS BIGINT) AS conv_removed6
            FROM p{_HOPS}
            WHERE r <> '__NONE__' AND s = '__START__'
        ),
        eff AS (
            SELECT rm.channel, b.conv6, rm.conv_removed6,
                   b.conv6 - rm.conv_removed6 AS drop6
            FROM removed rm CROSS JOIN base b
        ),
        tot AS (SELECT SUM(drop6) AS t FROM eff)
        SELECT e.channel, e.conv6 AS conv_base6, e.conv_removed6,
               ROUND(CAST(e.drop6 AS DOUBLE) / NULLIF(e.conv6, 0), 6)
                   AS removal_effect,
               ROUND(CAST(e.drop6 AS DOUBLE) / NULLIF(t.t, 0), 6)
                   AS attribution_share
        FROM eff e CROSS JOIN tot t
    """


@register(
    "q_events_attribution_markov",
    oracle=_attribution_oracle(),
    doc=(
        "Markov removal-effect attribution (Anderl et al. 2016): "
        "journeys as a first-order chain over channels (purchase "
        "converts and restarts the journey; non-converting journey "
        "end = NULL absorb), conversion probability within 3 hops "
        "from START, per-channel removal effect (forcing p(c)=0 == "
        "redirecting entries into c to the absorb) normalized to "
        "attribution shares — the data-driven multi-touch credit "
        "split, complementing last-touch q_events_attribution. "
        "Parity: transition probabilities snap ONCE to 1e6-scaled "
        "BIGINT; every hop is Σ P6·p6 (term ≤ 1e12, bounded states — "
        "BIGINT-safe) then TRUNCATING division by 1e6; absorbing "
        "states re-union after every hop. Doubles only in the two "
        "final ratio columns. Scale: one user_id window pass builds "
        "the transition matrix distributed; the matrix is BOUNDED "
        "(<= |states|² rows, sanctioned bounded-collect class), so "
        "the (removal × state) hop recursion is exact driver-side "
        "integer math (r7 verdict #4 trim: the join-chain version "
        "spent 5.3 s re-optimizing the events lineage per hop), and "
        "the rounding-sensitive ratios stay in Spark expressions."
    ),
    tags=("events", "attribution", "markov", "analytics"),
)
def q_events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_raw = F.lag("event_type").over(w)
    seq = e.select(
        "event_type",
        F.when(
            prev_raw.isNull() | (prev_raw == _CONV), F.lit("__START__")
        )
        .otherwise(prev_raw)
        .alias("src_state"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    # one window pass: each event emits its journey move plus (iff it
    # is a non-converting journey end) the END absorb edge — the
    # explode-of-concat is the same multiset as the oracle's UNION ALL
    # but never evaluates the user_id window twice
    moves = seq.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("src_state").alias("src"),
                        F.col("event_type").alias("dst"),
                    )
                ),
                F.when(
                    F.col("next_type").isNull()
                    & (F.col("event_type") != _CONV),
                    F.array(
                        F.struct(
                            F.col("event_type").alias("src"),
                            F.lit("__END__").alias("dst"),
                        )
                    ),
                ).otherwise(
                    F.array().cast("array<struct<src:string,dst:string>>")
                ),
            )
        ).alias("m")
    ).select("m.src", "m.dst")
    c = moves.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("cst")
    )
    cs = c.groupBy("src").agg(F.sum("cst").cast("bigint").alias("ctot"))
    trans = c.join(cs, "src").select(
        "src",
        "dst",
        F.round(F.col("cst").cast("double") / F.col("ctot") * _SCALE, 0)
        .cast("bigint")
        .alias("p6"),
    )
    # BOUNDED collect (sanctioned class, like q_attr_markov_removal's
    # 7x7 matrix): <= |states|^2 rows regardless of event volume. The
    # r7 close measured the distributed (removal x state) hop chain at
    # 5.3 s — not from data volume (the data-sized phase ends at
    # ``trans``) but from 3 join+groupBy stages each re-optimizing the
    # events-window lineage. The hop recursion is exact integer math
    # over this bounded matrix, so it runs driver-side (r7 verdict #4:
    # "compute all hops over the collected <=|states|^2 matrix"); the
    # rounding-sensitive final ratios stay in Spark expressions so the
    # result is bit-identical to the distributed formulation.
    rows = [(r.src, r.dst, r.p6) for r in trans.collect()]
    # every non-conversion event type appears as some move's dst, so
    # the channel set is exactly {dst} - {purchase, __END__}
    channels = sorted(
        {dst for _, dst, _ in rows} - {_CONV, "__END__"}
    )
    removals = channels + ["__NONE__"]
    srcs = sorted({src for src, _, _ in rows})
    p: dict[tuple[str, str], int] = {}
    for r in removals:
        for s in srcs:
            p[(r, s)] = 0
        p[(r, _CONV)] = _SCALE
        p[(r, "__END__")] = 0
    for _ in range(_HOPS):
        acc: dict[tuple[str, str], int] = {}
        for src, dst, p6t in rows:
            for r in removals:
                acc[(r, src)] = acc.get((r, src), 0) + p6t * p[(r, dst)]
        nxt: dict[tuple[str, str], int] = {}
        for r in removals:
            for s in srcs:
                # truncating // matches SQL div for the non-negative
                # scaled probabilities; removal forces p(r) = 0
                nxt[(r, s)] = 0 if s == r else acc.get((r, s), 0) // _SCALE
            nxt[(r, _CONV)] = _SCALE
            nxt[(r, "__END__")] = 0
        p = nxt
    base_conv6 = p.get(("__NONE__", "__START__"), 0)
    eff = spark.createDataFrame(
        [(c, base_conv6, p.get((c, "__START__"), 0)) for c in channels],
        "channel string, conv6 bigint, conv_removed6 bigint",
    ).withColumn("drop6", F.col("conv6") - F.col("conv_removed6"))
    tot = eff.agg(F.sum("drop6").alias("t"))
    return eff.crossJoin(F.broadcast(tot)).select(
        "channel",
        F.col("conv6").alias("conv_base6"),
        "conv_removed6",
        F.round(
            F.col("drop6").cast("double")
            / F.nullif(F.col("conv6").cast("double"), F.lit(0.0)),
            6,
        ).alias("removal_effect"),
        F.round(
            F.col("drop6").cast("double")
            / F.nullif(F.col("t").cast("double"), F.lit(0.0)),
            6,
        ).alias("attribution_share"),
    )
