"""Wave-13 operators (round 3): CEP pattern matching, product
quantization, and Markov removal-effect attribution.

- ``q_events_match_pattern`` — MATCH_RECOGNIZE-style complex-event
  pattern detection, relationalized: find strict V-shapes (two
  consecutive drops then a rebound) in each user's value series via
  lag windows; emit the bottom row with drop depth and rebound size.
  The CEP shape SQL engines expose as MATCH_RECOGNIZE (DOWN+ UP+),
  expressed with per-key ordered windows that Spark executes
  distributed.
- ``q_emb_pq_quantize`` — product quantization (Jégou et al. 2011):
  4 subspaces x 16 dims, codebook = the first 16 vectors' subvectors
  (deterministic, bounded), each vector assigned its nearest codeword
  per subspace by EXACT decimal L2 (embedding values quantized to 6 dp
  first, so distance comparisons are identical on both engines); per
  vector: the 4-byte code and the exact reconstruction error. The
  16x-compression middle tier between int8 and binary sign words.
- ``q_attr_markov_removal`` — Markov-chain attribution with removal
  effects (Anderl et al. 2016): per-user journeys become first-order
  transition counts (distributed, the corpus-sized phase); the bounded
  transition matrix (<= 7 states) is collected once and the absorption
  probabilities — full chain and with each channel removed — are
  computed by K quantized fixed-point steps replicated EXACTLY (Python
  Decimal vs unrolled SQL CTE steps, both rounding to 6 dp per step),
  yielding per-channel removal effects and attribution shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style V-shape detection
# ---------------------------------------------------------------------------


@register(
    "q_events_match_pattern",
    oracle="""
        WITH s AS (
            SELECT user_id, ts, value,
                   LAG(value, 1) OVER w AS p1,
                   LAG(value, 2) OVER w AS p2,
                   LAG(ts, 1) OVER w AS t1,
                   LEAD(value, 1) OVER w AS nxt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, t1 AS bottom_ts,
               CAST(CAST(p2 AS DECIMAL(14,6)) - CAST(p1 AS DECIMAL(14,6))
                    AS DOUBLE) AS drop_depth,
               CAST(CAST(value AS DECIMAL(14,6)) - CAST(p1 AS DECIMAL(14,6))
                    AS DOUBLE) AS rebound
        FROM s
        WHERE p2 IS NOT NULL AND p2 > p1 AND value > p1
    """,
    doc=(
        "MATCH_RECOGNIZE-style CEP pattern detection, relationalized: "
        "a strict V-shape (value drops from p2 to p1 then rebounds) in "
        "each user's event-time series, found with lag/lead windows and "
        "emitted as the bottom row plus drop depth and rebound size — "
        "the DOWN+ UP+ pattern a streaming CEP engine would express as "
        "MATCH_RECOGNIZE(PATTERN (A B+ C+)). Depth/rebound arithmetic "
        "is exact DECIMAL. Scale: one per-user ordered window, no "
        "joins, no global state."
    ),
    tags=("events", "pattern", "window"),
)
def q_events_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vd = lambda c: F.col(c).cast("decimal(14,6)")  # noqa: E731
    s = e.select(
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("p1"),
        F.lag("value", 2).over(w).alias("p2"),
        F.lag("ts", 1).over(w).alias("t1"),
    )
    return s.where(
        F.col("p2").isNotNull()
        & (F.col("p2") > F.col("p1"))
        & (F.col("value") > F.col("p1"))
    ).select(
        "user_id",
        F.col("t1").alias("bottom_ts"),
        (vd("p2") - vd("p1")).cast("double").alias("drop_depth"),
        (vd("value") - vd("p1")).cast("double").alias("rebound"),
    )


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace
_PQ_KC = 16  # codewords per subspace (codebook = first 16 vectors)

# 6dp-quantized decimal value of embedding dim d (1-based), exact on
# both engines (float -> double -> round -> decimal; see SKILL.md)
_Q6_SPARK = "cast(round(cast(element_at({v}, {d}) as double), 6) as decimal(12,6))"
_Q6_DUCK = "CAST(ROUND(CAST({v}[{d}] AS DOUBLE), 6) AS DECIMAL(12,6))"


def _pq_dist_spark(m: int) -> str:
    """Exact decimal squared L2 between subspace m of `embedding` and
    `c_emb` (codeword vector), as a Spark SQL expression."""
    terms = []
    for i in range(1, _PQ_SUB + 1):
        d = m * _PQ_SUB + i
        x = _Q6_SPARK.format(v="embedding", d=d)
        c = _Q6_SPARK.format(v="c_emb", d=d)
        # cast each term down: 16 chained (27,12) additions exceed
        # precision 38 on Spark, which silently drops the scale to 8
        terms.append(
            f"cast((({x}) - ({c})) * (({x}) - ({c})) as decimal(20,12))"
        )
    return " + ".join(terms)


def _pq_dist_duck(m: int) -> str:
    terms = []
    for i in range(1, _PQ_SUB + 1):
        d = m * _PQ_SUB + i
        x = _Q6_DUCK.format(v="v.embedding", d=d)
        c = _Q6_DUCK.format(v="c.embedding", d=d)
        terms.append(
            f"CAST((({x}) - ({c})) * (({x}) - ({c})) AS DECIMAL(20,12))"
        )
    return " + ".join(terms)


def _pq_oracle() -> str:
    subqueries = []
    for m in range(_PQ_M):
        subqueries.append(
            f"""a{m} AS (
                SELECT vec_id, code, d2 FROM (
                    SELECT v.vec_id, c.vec_id AS code,
                           {_pq_dist_duck(m)} AS d2,
                           ROW_NUMBER() OVER (
                               PARTITION BY v.vec_id
                               ORDER BY {_pq_dist_duck(m)} ASC,
                                        c.vec_id ASC) AS rn
                    FROM embeddings v
                    JOIN embeddings c ON c.vec_id < {_PQ_KC}
                ) WHERE rn = 1
            )"""
        )
    joins = " ".join(
        f"JOIN a{m} ON a{m}.vec_id = a0.vec_id" for m in range(1, _PQ_M)
    )
    err = " + ".join(f"a{m}.d2" for m in range(_PQ_M))
    codes = ", ".join(f"a{m}.code AS code_{m}" for m in range(_PQ_M))
    return f"""
        WITH {','.join(subqueries)}
        SELECT a0.vec_id, {codes},
               CAST({err} AS DOUBLE) AS recon_err
        FROM a0 {joins}
    """


def pq_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached PQ code index: (vec_id, code_0..3, d2_0..3).

    The materialized artifact a production vector store writes once and
    every ADC consumer reads: per vector, the nearest-codeword id per
    subspace (exact-decimal L2, code tie-break) plus the per-subspace
    residual. Shared by q_emb_pq_quantize (codes + reconstruction
    error) and q_sim_ann_ivfpq (ADC distance over the codes), persisted
    once per (session, sf) like the other index tables.
    """
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build() -> DataFrame:
        e = load(spark, sf_dir, "embeddings")
        code = e.filter(F.col("vec_id") < _PQ_KC).select(
            F.col("vec_id").alias("code"), F.col("embedding").alias("c_emb")
        )
        joined = e.select("vec_id", "embedding").join(F.broadcast(code))
        out = None
        for m in range(_PQ_M):
            d2 = F.expr(_pq_dist_spark(m))
            w = Window.partitionBy("vec_id").orderBy(
                F.col("d2").asc(), F.col("code").asc()
            )
            a = (
                joined.select("vec_id", "code", d2.alias("d2"))
                .withColumn("rn", F.row_number().over(w))
                .where("rn = 1")
                .select(
                    "vec_id",
                    F.col("code").alias(f"code_{m}"),
                    F.col("d2").alias(f"d2_{m}"),
                )
            )
            out = a if out is None else out.join(a, "vec_id")
        return out.persist()

    return _cached("pq_codes", spark, sf_dir, build)


@register(
    "q_emb_pq_quantize",
    oracle=_pq_oracle(),
    doc=(
        "Product quantization (Jegou et al. 2011): the 64-d embedding "
        "splits into 4 subspaces of 16 dims; each subspace is assigned "
        "its nearest codeword from a deterministic bounded codebook "
        "(the first 16 vectors' subvectors), giving a 4-byte code and "
        "an exact reconstruction error — the 16x-compression middle "
        "tier between int8 quantization and binary sign words in the "
        "engine's vector-compression ladder. Parity: embedding values "
        "quantize to 6 dp decimal BEFORE the distance arithmetic, so "
        "codeword selection compares exact decimals (no float-order "
        "ambiguity on either engine). Scale: the codebook is a bounded "
        "broadcast; assignment is one scan with 4x16 exact-decimal "
        "distance folds per row, map-side only — materialized once as "
        "the session-cached PQ code index shared with q_sim_ann_ivfpq."
    ),
    tags=("embedding", "quantization", "llm-pipeline"),
)
def q_emb_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = pq_codes_table(spark, sf_dir)
    err = sum((F.col(f"d2_{m}") for m in range(1, _PQ_M)), F.col("d2_0"))
    return codes.select(
        "vec_id",
        *[F.col(f"code_{m}") for m in range(_PQ_M)],
        err.cast("double").alias("recon_err"),
    )


# ---------------------------------------------------------------------------
# Markov-chain attribution with removal effects
# ---------------------------------------------------------------------------

_MK_K = 16  # fixed-point steps (chain diameter is tiny; 16 converges)
_MK_CHANNELS = ("click", "error", "signup", "view")  # non-conversion types
_MK_STATES = ("start",) + _MK_CHANNELS + ("purchase", "null")

_MK_JOURNEY_DUCK = """
    seq AS MATERIALIZED (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    fp AS MATERIALIZED (
        SELECT user_id, MIN(rn) AS prn FROM seq
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS MATERIALIZED (
        SELECT s.user_id, s.event_type, s.rn, fp.prn
        FROM seq s LEFT JOIN fp USING (user_id)
        WHERE fp.prn IS NULL OR s.rn <= fp.prn
    ),
    pairs AS MATERIALIZED (
        SELECT COALESCE(LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY rn), 'start') AS from_s,
               event_type AS to_s
        FROM j
        UNION ALL
        SELECT t.event_type AS from_s, 'null' AS to_s
        FROM (SELECT user_id, MAX(rn) AS mrn FROM j GROUP BY user_id) m
        JOIN j t ON t.user_id = m.user_id AND t.rn = m.mrn
        WHERE t.prn IS NULL
    ),
    trans AS MATERIALIZED (
        SELECT from_s, to_s, COUNT(*) AS n FROM pairs GROUP BY from_s, to_s
    ),
    probs AS MATERIALIZED (
        SELECT from_s, to_s,
               CAST(ROUND(CAST(n AS DOUBLE)
                          / SUM(n) OVER (PARTITION BY from_s), 6)
                    AS DECIMAL(10,6)) AS p6
        FROM trans
    ),
    states(s) AS (VALUES {states})
""".replace(
    "{states}", ", ".join(f"('{s}')" for s in _MK_STATES)
)


def _mk_chain_cte(tag: str, removed: str | None) -> str:
    """K unrolled quantized fixed-point steps for one chain variant."""
    zero_states = "'null'" + (f", '{removed}'" if removed else "")
    parts = [
        f"""p_{tag}_0 AS MATERIALIZED (
            SELECT s, CAST(CASE WHEN s = 'purchase' THEN 1 ELSE 0 END
                           AS DECIMAL(10,6)) AS p
            FROM states
        )"""
    ]
    for k in range(1, _MK_K + 1):
        parts.append(
            f"""p_{tag}_{k} AS MATERIALIZED (
                SELECT st.s,
                       CASE WHEN st.s = 'purchase'
                                THEN CAST(1 AS DECIMAL(10,6))
                            WHEN st.s IN ({zero_states})
                                THEN CAST(0 AS DECIMAL(10,6))
                            ELSE CAST(COALESCE(ROUND(x.acc, 6), 0)
                                      AS DECIMAL(10,6))
                       END AS p
                FROM states st
                LEFT JOIN (
                    SELECT pr.from_s AS s, SUM(pr.p6 * pv.p) AS acc
                    FROM probs pr JOIN p_{tag}_{k - 1} pv ON pv.s = pr.to_s
                    GROUP BY pr.from_s
                ) x ON x.s = st.s
            )"""
        )
    return ",\n".join(parts)


def _mk_oracle() -> str:
    chains = [_mk_chain_cte("full", None)]
    for c in _MK_CHANNELS:
        chains.append(_mk_chain_cte(c, c))
    conv_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel,"
        f" (SELECT p FROM p_full_{_MK_K} WHERE s = 'start') AS conv_full,"
        f" (SELECT p FROM p_{c}_{_MK_K} WHERE s = 'start') AS conv_removed"
        for c in _MK_CHANNELS
    )
    return f"""
        WITH {_MK_JOURNEY_DUCK},
        {','.join(chains)},
        conv AS MATERIALIZED ({conv_rows}),
        eff AS MATERIALIZED (
            SELECT channel, conv_full, conv_removed,
                   CAST(ROUND((CAST(conv_full AS DOUBLE)
                               - CAST(conv_removed AS DOUBLE))
                              / CAST(conv_full AS DOUBLE), 6)
                        AS DECIMAL(10,6)) AS effect6
            FROM conv
        ),
        touches AS (
            SELECT to_s AS channel, CAST(SUM(n) AS BIGINT) AS n_touches
            FROM trans GROUP BY to_s
        )
        SELECT e.channel,
               CAST(e.conv_full AS DOUBLE) AS conv_full,
               CAST(e.conv_removed AS DOUBLE) AS conv_removed,
               CAST(e.effect6 AS DOUBLE) AS removal_effect,
               ROUND(CAST(e.effect6 AS DOUBLE)
                     / CAST((SELECT SUM(effect6) FROM eff) AS DOUBLE), 6)
                   AS attribution,
               t.n_touches
        FROM eff e JOIN touches t USING (channel)
    """


@register(
    "q_attr_markov_removal",
    oracle=_mk_oracle(),
    doc=(
        "Markov-chain attribution with removal effects (Anderl et al. "
        "2016): per-user journeys (truncated at first conversion) "
        "become first-order transition counts — the corpus-sized, "
        "fully distributed phase; non-converters terminate in a null "
        "absorbing state. The BOUNDED transition matrix (7 states) is "
        "collected once, and conversion probability from 'start' is "
        "computed by K=16 quantized fixed-point steps — every step "
        "sums exact (10,6)x(10,6) decimal products and re-quantizes to "
        "6 dp, replicated operation-for-operation by the DuckDB "
        "oracle's unrolled CTE chain (5 chains x 16 steps: full plus "
        "each channel removed, where removal pins the channel's "
        "absorption value to 0 — every path through it becomes loss). "
        "Output: per-channel removal effect and normalized attribution "
        "share, joined back to the distributed per-channel touch "
        "counts. Scale: the only non-distributed object is the "
        "7x7-bounded matrix (sanctioned bounded-collect class)."
    ),
    tags=("events", "attribution", "graph", "statistics"),
)
def q_attr_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import ROUND_HALF_UP, Decimal

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # snapshot the sequenced events: fp and the pre-purchase slice both
    # read it (one window pass instead of two) (r11)
    seq = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).transform(snapshot(eager=False))
    fp = (
        seq.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    # snapshot the pre-purchase slice: transition pairs, last-step and
    # null-row branches all read it (3 references) (r11)
    j = (
        seq.join(fp, "user_id", "left")
        .where(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .transform(snapshot(eager=False))
    )
    w_j = Window.partitionBy("user_id").orderBy("rn")
    pairs = j.select(
        F.coalesce(F.lag("event_type").over(w_j), F.lit("start")).alias("from_s"),
        F.col("event_type").alias("to_s"),
    )
    last = j.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    null_rows = (
        last.join(j, ["user_id"])
        .where((F.col("rn") == F.col("mrn")) & F.col("prn").isNull())
        .select(F.col("event_type").alias("from_s"), F.lit("null").alias("to_s"))
    )
    trans = (
        pairs.unionByName(null_rows)
        .groupBy("from_s", "to_s")
        .agg(F.count("*").alias("n"))
    )
    # BOUNDED collect: <= |states|^2 rows regardless of event volume
    rows = trans.collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r.from_s] = totals.get(r.from_s, 0) + r.n
    q6 = Decimal("0.000001")
    p6 = {
        (r.from_s, r.to_s): Decimal(float(r.n) / float(totals[r.from_s])).quantize(
            q6, ROUND_HALF_UP
        )
        for r in rows
    }

    def solve(removed: str | None) -> Decimal:
        p = {s: Decimal(0) for s in _MK_STATES}
        p["purchase"] = Decimal(1)
        for _ in range(_MK_K):
            acc: dict[str, Decimal] = {}
            for (fs, ts), pr in p6.items():
                acc[fs] = acc.get(fs, Decimal(0)) + pr * p[ts]
            new = {}
            for s in _MK_STATES:
                if s == "purchase":
                    new[s] = Decimal(1)
                elif s == "null" or s == removed:
                    new[s] = Decimal(0)
                else:
                    new[s] = acc.get(s, Decimal(0)).quantize(q6, ROUND_HALF_UP)
            p = new
        return p["start"]

    full = solve(None)
    recs = []
    for c in _MK_CHANNELS:
        rem = solve(c)
        effect6 = Decimal(
            round((float(full) - float(rem)) / float(full), 6)
        ).quantize(q6, ROUND_HALF_UP)
        recs.append((c, float(full), float(rem), effect6))
    eff_total = sum(r[3] for r in recs)
    lit = spark.createDataFrame(
        [
            (
                c,
                cf,
                cr,
                float(e6),
                round(float(e6) / float(eff_total), 6),
            )
            for c, cf, cr, e6 in recs
        ],
        "channel string, conv_full double, conv_removed double,"
        " removal_effect double, attribution double",
    )
    touches = trans.groupBy(F.col("to_s").alias("channel")).agg(
        F.sum("n").cast("bigint").alias("n_touches")
    )
    return F.broadcast(lit).join(touches, "channel").select(
        "channel",
        "conv_full",
        "conv_removed",
        "removal_effect",
        "attribution",
        "n_touches",
    )
