"""Wave-27 operators (round 6, continued): data-selection, seasonal
decomposition, graph-structure, dimension-reduction, rank-stats and
privacy additions.

- ``q_text_dsir_weights`` — DSIR (Data Selection with Importance
  Resampling, Xie et al. 2023) hashed-bigram importance weights: both
  the raw corpus and a target domain (lang='en' here) are reduced to
  smoothed hashed-bigram unigram distributions over B=64 buckets; each
  document's log importance weight is the sum over its bigrams of
  log p_target/p_raw — the score DSIR resamples by to select
  pretraining data that matches a high-quality target.
- ``q_events_decompose_classical`` — classical additive seasonal
  decomposition of the per-type hourly count series: gap-free hour
  spine, centered 2x24 moving-average trend (exact x48 integer form),
  per-hour-of-day seasonal indices from the detrended remainder, and
  the mean-centered index per type. Complements q_events_seasonality
  (which joins a static hod profile, no trend removal).
- ``q_graph_label_propagation`` — synchronous label propagation
  (Raghavan et al. 2007) over the symmetrized k-NN similarity graph
  (wave-20's cached index artifact): three unrolled rounds, each node
  adopting its neighbors' most frequent label (min-label tie-break);
  output is the community histogram.
- ``q_graph_kcore`` — k-core peeling (k=5, 4 unrolled rounds) on the
  same undirected k-NN graph, emitting the per-round (nodes, edges)
  cascade. On an out-degree-4 kNN graph the 5-core is empty unless
  edge reciprocity is high — the cascade-to-empty IS the structural
  result, and the fixture fixpoint (round 3) is covered by a test
  that runs one extra round and asserts no change.
- ``q_emb_random_projection`` — Johnson-Lindenstrauss sign (Achlioptas
  2001) random projection 64 -> 8 dims with a deterministic md5-seeded
  Rademacher matrix baked into BOTH plans as literal +/-1 coefficients:
  per-vector projected coordinates (exact decimal signed sums scaled by
  1/sqrt(8)) and the squared-norm preservation ratio.
- ``q_stats_kruskal_wallis`` — rank-based one-way ANOVA (H test) across
  all five event types with exact midrank tie handling and the tie
  correction, built on the same distinct-value + exclusive-prefix-sum
  reduction as q_stats_mann_whitney (ranks are never materialized
  per row).
- ``q_privacy_l_diversity`` — distinct-l diversity audit over the
  (nation, market-segment) quasi-identifier groups with the account-
  balance band as the sensitive attribute — the companion check to
  q_privacy_k_anonymity (a k-anonymous group can still leak if every
  member shares the sensitive value).

Parity discipline as everywhere (plans/registry.py): md5-derived
bucket hashes computed identically on both engines, exact
DECIMAL/BIGINT accumulation with one rounding at definition, LN only
on identically-derived doubles (the q_text_tfidf precedent), fixed
unrolled iteration counts, deterministic tie-breaks, identical
aliases. Reference parity note: the reference's transformation plan is
empty (``WeatherProcessingJobPlan.java:9-11``); these extend the
north-star LLM-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.operators.global_order import attach_prefix_sum
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

# ---------------------------------------------------------------------------
# DSIR hashed-bigram importance weights
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hashed feature buckets
_DSIR_TARGET_LANG = "en"  # the "high-quality target domain" stand-in

# md5 -> 60-bit int -> bucket; positive, so % == pmod on both engines
_DSIR_BUCKET_SPARK = (
    "pmod(cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint), " f"{_DSIR_B})"
)
_DSIR_BUCKET_DUCK = f"CAST('0x' || md5(g)[1:15] AS BIGINT) % {_DSIR_B}"


def dsir_grams(d: DataFrame) -> DataFrame:
    """(doc_id, lang, g, bucket): the exploded hashed-bigram stream —
    shared by the weight query, the collision audit, and (expression-
    wise) the streaming scorer."""
    tok = d.select(
        "doc_id",
        "lang",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok"),
    ).where(F.expr("size(tok) >= 2"))
    return tok.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tok) - 1),"
                " i -> concat(element_at(tok, cast(i as int)), ' ',"
                " element_at(tok, cast(i + 1 as int))))"
            )
        ).alias("g"),
    ).select("doc_id", "lang", "g", F.expr(_DSIR_BUCKET_SPARK).alias("bucket"))


def dsir_lr_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The B-row (bucket, lr9) distribution model — the broadcastable
    artifact a production DSIR pass trains once and ships to scorers
    (including the streaming twin in analytics_wave28)."""
    grams = dsir_grams(load(spark, sf_dir, "documents"))
    bstats = grams.groupBy("bucket").agg(
        F.count("*").alias("cr"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("ct"),
    )
    tot = bstats.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    return bstats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + _DSIR_B))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("tr") + _DSIR_B)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("lr9"),
    )



@register(
    "q_text_dsir_weights",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang,
                   {_DSIR_BUCKET_DUCK} AS bucket
            FROM (
                SELECT doc_id, lang,
                       tok[i] || ' ' || tok[i + 1] AS g
                FROM tok, UNNEST(range(1, len(tok))) AS r(i)
                WHERE len(tok) >= 2
            )
        ),
        bstats AS (
            SELECT bucket, COUNT(*) AS cr,
                   SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                       AS ct
            FROM grams GROUP BY bucket
        ),
        tot AS (
            SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM bstats
        ),
        lr AS (
            -- add-1 smoothed log ratio, ONE rounding at definition
            SELECT bucket,
                   CAST(ROUND(
                       LN(CAST(ct + 1 AS DOUBLE) / (tt + {_DSIR_B}))
                       - LN(CAST(cr + 1 AS DOUBLE) / (tr + {_DSIR_B})),
                       9) AS DECIMAL(18,9)) AS lr9
            FROM bstats CROSS JOIN tot
        ),
        per_doc AS (
            -- SUM the decimal directly: multiplying by a BIGINT first
            -- would push Spark's product type past precision 38 and
            -- silently trim the scale to 8
            SELECT g.doc_id, COUNT(*) AS n_grams, SUM(lr.lr9) AS logw
            FROM grams g JOIN lr ON lr.bucket = g.bucket
            GROUP BY g.doc_id
        )
        SELECT doc_id, n_grams,
               -- ROUND the DECIMAL (half-up in both engines), THEN cast:
               -- rounding the double instead diverges on exact scale-9
               -- ties (Spark half-up on the double's true expansion,
               -- DuckDB double arithmetic)
               CAST(ROUND(logw, 6) AS DOUBLE) AS log_weight,
               logw > 0 AS target_like
        FROM per_doc
    """,
    doc=(
        "DSIR importance weights (Xie et al. 2023): hashed-bigram "
        f"features over B={_DSIR_B} md5 buckets, add-1 smoothed bucket "
        "distributions for the raw corpus vs the target domain "
        f"(lang='{_DSIR_TARGET_LANG}'), per-document log importance "
        "weight = sum over its bigrams of the bucket log ratio "
        "log p_t/p_r — the resampling score that selects pretraining "
        "data resembling the target. Scale: the gram stream is "
        "map-side md5 arithmetic; the distribution model is B rows "
        "(broadcast); the per-doc weight is one partial-aggregated "
        "groupBy on doc_id. The bucket log-ratios are rounded ONCE to "
        "DECIMAL(18,9) so the per-doc sum is exact-decimal "
        "(order-free) on both engines; LN runs on identically-derived "
        "doubles (the q_text_tfidf precedent)."
    ),
    tags=("text", "llm-pipeline", "sampling", "importance"),
)
def q_text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = dsir_grams(load(spark, sf_dir, "documents"))
    lr = dsir_lr_table(spark, sf_dir)
    per_doc = (
        grams.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lr9").alias("logw"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        F.round(F.col("logw"), 6).cast("double").alias("log_weight"),
        (F.col("logw") > 0).alias("target_like"),
    )


# ---------------------------------------------------------------------------
# classical additive seasonal decomposition (trend + seasonal index)
# ---------------------------------------------------------------------------

_DEC_PERIOD = 24  # hours
_DEC_HALF = _DEC_PERIOD // 2  # 12


@register(
    "q_events_decompose_classical",
    oracle=f"""
        WITH bounds AS (
            SELECT event_type,
                   date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM events GROUP BY event_type
        ),
        spine AS (
            SELECT event_type,
                   UNNEST(range(h0, h1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR))
                       AS h
            FROM bounds
        ),
        hourly AS (
            SELECT s.event_type, s.h, COALESCE(c.cnt, 0) AS cnt
            FROM spine s LEFT JOIN (
                SELECT event_type, date_trunc('hour', ts) AS h,
                       COUNT(*) AS cnt
                FROM events GROUP BY 1, 2
            ) c ON c.event_type = s.event_type AND c.h = s.h
        ),
        ma AS (
            -- centered 2x24 MA in exact x48 integer form:
            -- 48*trend = x[t-12] + x[t+12] + 2 * sum(x[t-11..t+11])
            SELECT event_type, h, cnt,
                   LAG(cnt, {_DEC_HALF}) OVER w AS lag12,
                   LEAD(cnt, {_DEC_HALF}) OVER w AS lead12,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN {_DEC_HALF - 1} PRECEDING
                                AND {_DEC_HALF - 1} FOLLOWING) AS s23
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ),
        detr AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM h) AS INT) AS hod,
                   48 * cnt - (lag12 + lead12 + 2 * s23) AS detr48
            FROM ma WHERE lag12 IS NOT NULL AND lead12 IS NOT NULL
        ),
        idx AS (
            SELECT event_type, hod, COUNT(*) AS n_obs,
                   CAST(ROUND(CAST(SUM(detr48) AS DOUBLE)
                              / (48.0 * COUNT(*)), 9) AS DECIMAL(18,9))
                       AS idx9
            FROM detr GROUP BY event_type, hod
        )
        SELECT event_type, hod, n_obs,
               CAST(ROUND(idx9, 6) AS DOUBLE) AS seasonal_raw,
               ROUND(CAST(idx9 AS DOUBLE)
                     - CAST(SUM(idx9) OVER (PARTITION BY event_type)
                            AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY event_type), 6)
                   AS seasonal_centered
        FROM idx
    """,
    doc=(
        "Classical additive seasonal decomposition of the per-type "
        "hourly count series: gap-free hour spine (sequence join, "
        "missing hours = 0), centered 2x24 moving-average trend kept "
        "in EXACT x48 integer form (48*trend = edge terms + twice the "
        "23-hour core sum, so detrending never touches a double), "
        "per-hour-of-day seasonal index = mean detrended remainder "
        "(one double division at definition, then DECIMAL), and the "
        "mean-centered index per type. Scale: windows partition by "
        "event_type; the spine is |types| x hours rows; the index "
        "table is |types| x 24 — everything after the first rollup is "
        "model-sized. The hod-profile join of q_events_seasonality "
        "scores observations; this one removes trend first, the "
        "textbook decomposition."
    ),
    tags=("timeseries", "stats", "decomposition"),
)
def q_events_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("h"),
    )
    counts = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("cnt"))
    hourly = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    w23 = w.rowsBetween(-(_DEC_HALF - 1), _DEC_HALF - 1)
    ma = hourly.select(
        "event_type",
        "h",
        "cnt",
        F.lag("cnt", _DEC_HALF).over(w).alias("lag12"),
        F.lead("cnt", _DEC_HALF).over(w).alias("lead12"),
        F.sum("cnt").over(w23).alias("s23"),
    )
    detr = ma.where(
        F.col("lag12").isNotNull() & F.col("lead12").isNotNull()
    ).select(
        "event_type",
        F.hour("h").alias("hod"),
        (
            F.lit(48) * F.col("cnt")
            - (F.col("lag12") + F.col("lead12") + F.lit(2) * F.col("s23"))
        ).alias("detr48"),
    )
    idx = detr.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_obs"),
        F.round(
            F.sum("detr48").cast("double") / (F.lit(48.0) * F.count("*")), 9
        )
        .cast("decimal(18,9)")
        .alias("idx9"),
    )
    wt = Window.partitionBy("event_type")
    return idx.select(
        "event_type",
        "hod",
        "n_obs",
        F.round(F.col("idx9"), 6).cast("double").alias("seasonal_raw"),
        F.round(
            F.col("idx9").cast("double")
            - F.sum("idx9").over(wt).cast("double") / F.count("*").over(wt),
            6,
        ).alias("seasonal_centered"),
    )


# ---------------------------------------------------------------------------
# shared: the symmetrized k-NN similarity graph (oracle CTE + Spark table)
# ---------------------------------------------------------------------------


def _und_edges_cte() -> str:
    """DuckDB WITH fragment ending in CTE ``und`` (src, dst): the
    symmetrized wave-20 k-NN graph — the same ``edges`` text as
    analytics_wave20._graph_oracle composed on ivf_assigned_cte, then
    both directions unioned (distinct)."""
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE, knn_edges_cte
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    return f"""{ivf_assigned_cte()},
        {SZ_CTE},
        {knn_edges_cte()},
        und AS MATERIALIZED (
            SELECT src, dst FROM edges
            UNION
            SELECT dst, src FROM edges
        )"""


def _und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized (src, dst) edge DataFrame over the session-cached
    k-NN index (analytics_wave20.knn_edges_table)."""
    from weather_flink_spark.plans.analytics_wave20 import knn_edges_table

    e = knn_edges_table(spark, sf_dir)
    return e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


# ---------------------------------------------------------------------------
# synchronous label propagation (3 unrolled rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_labels(spark: SparkSession, sf_dir: str, rounds: int) -> DataFrame:
    """(node, label) after ``rounds`` synchronous LPA rounds on the
    undirected k-NN graph; labels start as vec_id, each round every
    node adopts its neighbors' most frequent label (count DESC,
    min-label tie-break)."""
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    und = _und_edges(spark, sf_dir)
    labels = ivf_assigned_table(spark, sf_dir).select(
        F.col("vec_id").alias("node"), F.col("vec_id").alias("label")
    )
    for _ in range(rounds):
        neigh = (
            und.join(
                labels.select(
                    F.col("node").alias("dst"), "label"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        # argmax by (count DESC, label ASC) as ONE lexicographic struct
        # MAX — partial-aggregated, no sort-based window per round (the
        # q_events_funnel_attribution composite-MAX idiom)
        labels = neigh.groupBy("node").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias(
                "best"
            )
        ).select("node", (-F.col("best.nl")).alias("label"))
        # snapshot each synchronous round (the wave-26/kcore lesson,
        # lazy variant): without it round r's plan re-plans rounds
        # 1..r-1 per reference — 240 shuffle exchanges for a
        # 3-round/9-exchange computation (r11 before-plan)
        labels = labels.transform(snapshot(eager=False))
    return labels


def _lpa_oracle(rounds: int) -> str:
    steps = []
    prev = "l0"
    for r in range(1, rounds + 1):
        steps.append(
            f"""n{r} AS (
                SELECT u.src AS node, l.label, COUNT(*) AS c
                FROM und u JOIN {prev} l ON l.node = u.dst
                GROUP BY 1, 2
            ),
            l{r} AS MATERIALIZED (
                SELECT node, label FROM (
                    SELECT node, label, ROW_NUMBER() OVER (
                        PARTITION BY node
                        ORDER BY c DESC, label ASC) AS rk
                    FROM n{r}
                ) WHERE rk = 1
            )"""
        )
        prev = f"l{r}"
    return f"""
        WITH {_und_edges_cte()},
        l0 AS (SELECT vec_id AS node, vec_id AS label FROM embeddings),
        {",".join(steps)}
        SELECT label AS community, COUNT(*) AS size,
               MIN(node) AS min_member, MAX(node) AS max_member
        FROM l{rounds} GROUP BY label
    """


@register(
    "q_graph_label_propagation",
    oracle=_lpa_oracle(_LPA_ROUNDS),
    doc=(
        "Synchronous label propagation (Raghavan et al. 2007) over the "
        "symmetrized k-NN similarity graph — the cheap community "
        "detector for near-duplicate / topical grouping: labels start "
        f"as vec_id; {_LPA_ROUNDS} unrolled rounds, each node adopting "
        "its neighbors' most frequent label with the deterministic "
        "(count DESC, min label) tie-break; output is the community "
        "histogram. Scale: one edge-keyed shuffle + one (node,label) "
        "partial-aggregated groupBy per round on the FIXED index-"
        "artifact edge list (out-degree bounded by the kNN build) — "
        "rounds are bounded, nothing quadratic, no driver loop. Rides "
        "the session-cached wave-20 edge table; the oracle replays the "
        "same edge construction from ivf_assigned_cte."
    ),
    tags=("graph", "community", "similarity"),
)
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _lpa_labels(spark, sf_dir, _LPA_ROUNDS)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("size"),
        F.min("node").alias("min_member"),
        F.max("node").alias("max_member"),
    )


# ---------------------------------------------------------------------------
# k-core peeling cascade (4 unrolled rounds)
# ---------------------------------------------------------------------------

_KCORE_K = 5
_KCORE_ROUNDS = 4


def _kcore_rounds(
    spark: SparkSession, sf_dir: str, k: int, rounds: int
) -> DataFrame:
    """Per-round (round, n_nodes, n_halfedges) of k-core peeling on the
    undirected k-NN graph: round r keeps nodes whose degree in the
    round r-1 edge set is >= k, then restricts edges to kept nodes.
    Counts stay distributed (one agg per round, unioned)."""
    # eager localCheckpoint per round (the wave-26 HNSW lesson): the
    # count branches and the next round would otherwise each re-execute
    # the whole peeling lineage from the kNN build
    und = _und_edges(spark, sf_dir).transform(snapshot())
    out = [
        und.agg(
            F.countDistinct("src").alias("n_nodes"),
            F.count("*").alias("n_halfedges"),
        ).select(F.lit(0).alias("round"), "n_nodes", "n_halfedges")
    ]
    cur = und
    for r in range(1, rounds + 1):
        keep = (
            cur.groupBy("src")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= k)
            .select(F.col("src").alias("node"))
        )
        cur = (
            cur.join(
                keep.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .join(keep.select(F.col("node").alias("dst")), "dst", "left_semi")
            .transform(snapshot())
        )
        out.append(
            cur.agg(
                F.countDistinct("src").alias("n_nodes"),
                F.count("*").alias("n_halfedges"),
            ).select(F.lit(r).alias("round"), "n_nodes", "n_halfedges")
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def _kcore_oracle(k: int, rounds: int) -> str:
    steps = []
    prev = "und"
    selects = [
        "SELECT 0 AS round, (SELECT COUNT(DISTINCT src) FROM und) AS n_nodes,"
        " (SELECT COUNT(*) FROM und) AS n_halfedges"
    ]
    for r in range(1, rounds + 1):
        # MATERIALIZED is load-bearing: each e{r} is referenced by the
        # next round AND two scalar count subqueries — DuckDB would
        # otherwise inline (and re-execute the whole k-means replay)
        # exponentially per reference
        steps.append(
            f"""keep{r} AS MATERIALIZED (
                SELECT src AS node FROM {prev}
                GROUP BY src HAVING COUNT(*) >= {k}
            ),
            e{r} AS MATERIALIZED (
                SELECT u.src, u.dst FROM {prev} u
                JOIN keep{r} a ON a.node = u.src
                JOIN keep{r} b ON b.node = u.dst
            )"""
        )
        selects.append(
            f"SELECT {r}, (SELECT COUNT(DISTINCT src) FROM e{r}),"
            f" (SELECT COUNT(*) FROM e{r})"
        )
        prev = f"e{r}"
    return f"""
        WITH {_und_edges_cte()},
        {",".join(steps)}
        {" UNION ALL ".join(selects)}
    """


@register(
    "q_graph_kcore",
    oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS),
    doc=(
        f"k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} unrolled "
        "rounds) on the symmetrized k-NN graph, emitting the per-round "
        "(nodes, half-edges) cascade — the degeneracy audit dedup/"
        "community pipelines run before trusting a graph's density. "
        "On an out-degree-4 kNN graph the 5-core is empty unless edge "
        "reciprocity is high; the cascade-to-empty on this corpus IS "
        "the structural finding (fixpoint by round 3 at the fixtures; "
        "a test runs one extra round and asserts no change). Scale: "
        "each round is one degree groupBy + two semi-joins on the "
        "shrinking edge set, all keyed on node — bounded rounds, no "
        "driver loop; output is rounds+1 rows."
    ),
    tags=("graph", "structure"),
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kcore_rounds(spark, sf_dir, _KCORE_K, _KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign random projection 64 -> 8
# ---------------------------------------------------------------------------

_RP_IN = 64
_RP_OUT = 8


def _rp_sign(i: int, j: int) -> int:
    """Deterministic Rademacher +/-1 from md5('rp:i:j') — computed
    ONCE in Python and baked into both plans as literals, so neither
    engine hashes anything at run time."""
    h = int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


_RP_SIGNS = [
    [_rp_sign(i, j) for i in range(_RP_IN)] for j in range(_RP_OUT)
]

# 6dp-quantized component, scaled to an EXACT integer (x * 1e6): signed
# sums and squared norms then accumulate in BIGINT — no decimal-chain
# precision-cap divergence between engines (|n| <= 1e7-ish per
# component, so 64-term signed sums and sums of squares stay far below
# 2^63)
_RPN_SPARK = (
    "cast(cast(round(cast(element_at(embedding, {d}) as double), 6)"
    " as decimal(12,6)) * 1000000 as bigint)"
)
_RPN_DUCK = (
    "CAST(CAST(ROUND(CAST(embedding[{d}] AS DOUBLE), 6) AS DECIMAL(12,6))"
    " * 1000000 AS BIGINT)"
)


def _rp_sum(j: int) -> str:
    """Signed-sum text over the pre-projected scaled-integer n1..n64
    columns for output dim j (same text both engines)."""
    terms = [
        f"{'+' if _RP_SIGNS[j][i] > 0 else '-'} n{i + 1}"
        for i in range(_RP_IN)
    ]
    return " ".join(terms).lstrip("+ ")


def _rp_select() -> str:
    """Projection select list: unrounded yd1..yd8 doubles (unscale,
    then the 1/sqrt(8) JL factor — two deterministic double ops)."""
    return ", ".join(
        f"CAST(num{j + 1} AS DOUBLE) / 1000000.0 / SQRT(8.0) AS yd{j + 1}"
        for j in range(_RP_OUT)
    )


_RP_PNORM = " + ".join(f"yd{j + 1} * yd{j + 1}" for j in range(_RP_OUT))
_RP_XNORM = " + ".join(f"n{i + 1} * n{i + 1}" for i in range(_RP_IN))


@register(
    "q_emb_random_projection",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   {", ".join(_RPN_DUCK.format(d=i + 1) + f" AS n{i + 1}" for i in range(_RP_IN))}
            FROM embeddings
        ),
        nums AS (
            SELECT vec_id,
                   {", ".join(f"CAST({_rp_sum(j)} AS BIGINT) AS num{j + 1}" for j in range(_RP_OUT))},
                   CAST({_RP_XNORM} AS BIGINT) AS xn2s
            FROM q
        ),
        yd AS (
            SELECT vec_id, xn2s, {_rp_select()}
            FROM nums
        )
        SELECT vec_id,
               {", ".join(f"ROUND(yd{j + 1}, 6) AS y{j + 1}" for j in range(_RP_OUT))},
               ROUND(({_RP_PNORM}) / (CAST(xn2s AS DOUBLE) / 1000000000000.0),
                     6) AS norm_ratio
        FROM yd
    """,
    doc=(
        "Johnson-Lindenstrauss sign random projection (Achlioptas "
        f"2001): {_RP_IN} -> {_RP_OUT} dims via a deterministic "
        "md5-seeded Rademacher matrix baked into BOTH plans as literal "
        "+/-1 coefficients (no run-time hashing, trivially "
        "reproducible). Coordinates are exact-decimal signed sums of "
        "the 6dp-quantized inputs scaled by 1/sqrt(8) (one double op "
        "per dim); norm_ratio = |y|^2/|x|^2 surfaces the distance-"
        "preservation quality JL guarantees in expectation — the "
        "dimension-reduction front end for ANN at 100 TB (project "
        "once, index the short vectors). Scale: pure map-side "
        "expressions, no shuffle at all; whole-stage-codegen "
        "arithmetic, no UDF."
    ),
    tags=("embedding", "dimension-reduction", "llm-pipeline"),
)
def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        *[
            F.expr(_RPN_SPARK.format(d=i + 1)).alias(f"n{i + 1}")
            for i in range(_RP_IN)
        ],
    )
    nums = q.select(
        "vec_id",
        *[
            F.expr(_rp_sum(j)).cast("bigint").alias(f"num{j + 1}")
            for j in range(_RP_OUT)
        ],
        F.expr(_RP_XNORM).cast("bigint").alias("xn2s"),
    )
    yd = nums.select(
        "vec_id",
        "xn2s",
        *[
            (
                F.col(f"num{j + 1}").cast("double")
                / F.lit(1000000.0)
                / F.sqrt(F.lit(8.0))
            ).alias(f"yd{j + 1}")
            for j in range(_RP_OUT)
        ],
    )
    return yd.select(
        "vec_id",
        *[F.round(F.col(f"yd{j + 1}"), 6).alias(f"y{j + 1}") for j in range(_RP_OUT)],
        F.round(
            F.expr(_RP_PNORM)
            / (F.col("xn2s").cast("double") / F.lit(1000000000000.0)),
            6,
        ).alias("norm_ratio"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H (rank one-way ANOVA, all five event types)
# ---------------------------------------------------------------------------

_KW_TYPES = ("click", "error", "purchase", "signup", "view")


def _kw_term_sql(t: str) -> str:
    """Per-group H term (2R/2)^2 / n as identical double text."""
    return (
        f"(CAST(two_r_{t} AS DOUBLE) / 2) * (CAST(two_r_{t} AS DOUBLE) / 2)"
        f" / n_{t}"
    )


@register(
    "q_stats_kruskal_wallis",
    oracle=f"""
        WITH vt AS (
            SELECT value, event_type, COUNT(*) AS cvt
            FROM events GROUP BY 1, 2
        ),
        pts AS (
            SELECT value, SUM(cvt) AS ct FROM vt GROUP BY value
        ),
        ranked AS (
            SELECT value, ct,
                   COALESCE(SUM(ct) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM pts
        ),
        rsum AS (
            -- midrank of a tie group = cum_before + (ct+1)/2; exact in
            -- halves, so accumulate 2*rank-sums per group in BIGINT
            SELECT v.event_type,
                   CAST(SUM(v.cvt) AS BIGINT) AS n_g,
                   CAST(SUM(v.cvt * (2 * r.cum_before + r.ct + 1))
                        AS BIGINT) AS two_r
            FROM vt v JOIN ranked r ON r.value = v.value
            GROUP BY v.event_type
        ),
        ties AS (
            SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie_term,
                   CAST(SUM(ct) AS BIGINT) AS n_total
            FROM pts
        ),
        piv AS (
            SELECT
                {", ".join(f"MAX(CASE WHEN event_type = '{t}' THEN n_g END) AS n_{t}, MAX(CASE WHEN event_type = '{t}' THEN two_r END) AS two_r_{t}" for t in _KW_TYPES)}
            FROM rsum
        )
        SELECT t.n_total, t.tie_term,
               ROUND(12.0 / (CAST(t.n_total AS DOUBLE) * (t.n_total + 1))
                     * ({" + ".join(_kw_term_sql(t) for t in _KW_TYPES)})
                     - 3.0 * (t.n_total + 1), 9) AS h_stat,
               ROUND((12.0 / (CAST(t.n_total AS DOUBLE) * (t.n_total + 1))
                      * ({" + ".join(_kw_term_sql(t) for t in _KW_TYPES)})
                      - 3.0 * (t.n_total + 1))
                     / (1.0 - CAST(t.tie_term AS DOUBLE)
                        / (t.n_total * t.n_total * t.n_total - t.n_total)),
                     9) AS h_corrected
        FROM piv CROSS JOIN ties t
    """,
    doc=(
        "Kruskal-Wallis H (rank one-way ANOVA) across all five event "
        "types with exact midrank tie handling and the tie-corrected "
        "statistic — the k-group extension of q_stats_mann_whitney, "
        "on the same reduction: per-distinct-value counts, the "
        "distributed exclusive prefix sum for ranks-before, and "
        "2*rank-sums per group accumulated in exact BIGINT (midranks "
        "are half-integers), so ranks are never materialized per row "
        "and no partitionless window exists. The five per-group H "
        "terms are pivoted onto one row and summed as an explicit "
        "left-associated chain — identical double-op order on both "
        "engines. Scale: cost is one groupBy on (value, type), the "
        "two-pass prefix-sum primitive, and model-sized everything "
        "after."
    ),
    tags=("stats", "nonparametric", "rank"),
)
def q_stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    vt = e.groupBy("value", "event_type").agg(F.count("*").alias("cvt"))
    pts = vt.groupBy("value").agg(F.sum("cvt").alias("ct"))
    ranked = attach_prefix_sum(
        pts, [F.col("value").asc()], "ct", "cum_before", exclusive=True
    ).withColumn("cum_before", F.coalesce(F.col("cum_before"), F.lit(0)))
    rsum = (
        vt.join(ranked.select("value", "ct", "cum_before"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("cvt").cast("bigint").alias("n_g"),
            F.sum(
                F.col("cvt")
                * (F.lit(2) * F.col("cum_before") + F.col("ct") + F.lit(1))
            )
            .cast("bigint")
            .alias("two_r"),
        )
    )
    ties = pts.agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("bigint")
        .alias("tie_term"),
        F.sum("ct").cast("bigint").alias("n_total"),
    )
    piv = rsum.agg(
        *[
            agg
            for t in _KW_TYPES
            for agg in (
                F.max(
                    F.when(F.col("event_type") == t, F.col("n_g"))
                ).alias(f"n_{t}"),
                F.max(
                    F.when(F.col("event_type") == t, F.col("two_r"))
                ).alias(f"two_r_{t}"),
            )
        ]
    )
    j = piv.crossJoin(F.broadcast(ties))

    def term(t: str):
        half = F.col(f"two_r_{t}").cast("double") / 2
        return half * half / F.col(f"n_{t}")

    terms = term(_KW_TYPES[0])
    for t in _KW_TYPES[1:]:
        terms = terms + term(t)
    n = F.col("n_total")
    h = (
        F.lit(12.0) / (n.cast("double") * (n + 1)) * terms
        - F.lit(3.0) * (n + 1)
    )
    corr = F.lit(1.0) - F.col("tie_term").cast("double") / (
        n * n * n - n
    )
    return j.select(
        "n_total",
        "tie_term",
        F.round(h, 9).alias("h_stat"),
        F.round(h / corr, 9).alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# distinct-l diversity audit
# ---------------------------------------------------------------------------

_LDIV_L = 3


@register(
    "q_privacy_l_diversity",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS group_size,
               COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS INT))
                   AS l_distinct,
               COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS INT))
                   >= {_LDIV_L} AS l_ok
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    doc=(
        "Distinct-l diversity audit (Machanavajjhala et al. 2007) over "
        "the (nation, market-segment) quasi-identifier groups with the "
        "account-balance band (1000-unit floor) as the sensitive "
        "attribute: per group, its size, the number of distinct "
        "sensitive values, and whether it meets l >= "
        f"{_LDIV_L} — the companion check to q_privacy_k_anonymity (a "
        "k-anonymous group still leaks if every member shares the "
        "sensitive value). Scale: one partial-aggregated groupBy on "
        "the QI key; output is |nations| x |segments| rows."
    ),
    tags=("privacy", "aggregate"),
)
def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("int")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("group_size"),
        F.countDistinct(band).alias("l_distinct"),
        (F.countDistinct(band) >= _LDIV_L).alias("l_ok"),
    )
