"""Wave-16 operators (round 4): point-in-time joins, snapshot diffing,
embedding prefix quality, dedup-cluster profiling, training-shard
assignment, discrete percentiles, and BM25 retrieval.

- ``q_join_temporal_scd2`` — feature-store point-in-time enrichment:
  each purchase joins the SCD2 state interval that was valid AT its
  event time (composes q_scd2_intervals), the correctness contract
  behind training-serving skew prevention.
- ``q_cdc_snapshot_diff`` — table-diff audit between the changelog's
  state at T1 and at T2: per user added/changed/unchanged
  classification with before/after states.
- ``q_emb_matryoshka_quality`` — prefix-dimension quality curve of the
  embedding corpus (Kusupati et al. 2022 MRL): per prefix length, the
  average retained-energy ratio ||x[:k]||²/||x||² and prefix cosine
  ||x[:k]||/||x|| — the measurement that picks a truncation dim for
  cheap first-pass retrieval.
- ``q_dedup_cluster_sizes`` — duplicate-cluster size histogram riding
  the converged connected-component labels (composes the recursive-CTE
  cluster oracle).
- ``q_pack_shuffle_shards`` — deterministic training shard + intra-shard
  order assignment (seeded md5, never rand()): the reproducible
  data-order contract an LLM training run needs for resumable epochs.
- ``q_agg_percentile_disc`` — exact DISCRETE percentiles (order
  statistic at ceil(p*n), no interpolation) per group, via explicit
  rank selection identical on both engines.
- ``q_text_bm25_topk`` — query-time retrieval: top-10 documents by the
  corpus BM25 score (composes q_text_bm25's scoring), the
  TakeOrderedAndProject serving shape.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
analytics + LLM-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Point-in-time join against SCD2 intervals
# ---------------------------------------------------------------------------


def _scd2_cte() -> str:
    from weather_flink_spark.plans.pipeline_extra import _SCD2_BODY

    return _SCD2_BODY.format(events="events")


@register(
    "q_join_temporal_scd2",
    oracle=f"""
        WITH iv AS MATERIALIZED ({_scd2_cte()}),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT event_id, user_id, ts, state_at_event, state_since,
               n_events_in_state FROM (
            SELECT p.event_id, p.user_id, p.ts,
                   i.state AS state_at_event,
                   i.valid_from AS state_since,
                   i.n_events AS n_events_in_state,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.event_id
                       ORDER BY i.valid_from DESC) AS rn
            FROM purchases p
            JOIN iv i
              ON i.user_id = p.user_id
             AND p.ts >= i.valid_from
             AND (i.valid_to IS NULL OR p.ts < i.valid_to)
        ) WHERE rn = 1
    """,
    doc=(
        "Feature-store point-in-time join: each purchase event is "
        "enriched with the SCD2 state interval that was valid AT its "
        "event time (latest valid_from wins on boundary ties) — the "
        "correctness contract that prevents training-serving skew "
        "(a model must never see state from the future). Composes "
        "q_scd2_intervals; the interval join is keyed on user_id, so "
        "at 100 TB each task sees one key-group's bounded interval "
        "list, never a global range join."
    ),
    tags=("join", "cdc", "feature-store", "llm-pipeline"),
)
def q_join_temporal_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.pipeline_extra import q_scd2_intervals

    iv = q_scd2_intervals(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = p.join(
        iv,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("valid_from").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("p_ts").alias("ts"),
            F.col("state").alias("state_at_event"),
            F.col("valid_from").alias("state_since"),
            F.col("n_events").alias("n_events_in_state"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot diff between two changelog cut-offs
# ---------------------------------------------------------------------------

def _snap_duck(pred: str) -> str:
    return f"""
        SELECT user_id, event_type AS state, ts FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE {pred}
        ) WHERE rn = 1
    """


@register(
    "q_cdc_snapshot_diff",
    oracle=f"""
        WITH cut AS (
            -- mid-range cut-off in integer microseconds: floor-div, so
            -- the boundary is engine-exact
            SELECT MIN(epoch_us(ts))
                   + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS tc
            FROM events
        ),
        s_old AS ({_snap_duck("epoch_us(ts) <= (SELECT tc FROM cut)")}),
        s_new AS ({_snap_duck("TRUE")})
        SELECT
            COALESCE(n.user_id, o.user_id) AS user_id,
            o.state AS state_old,
            n.state AS state_new,
            CASE WHEN o.user_id IS NULL THEN 'added'
                 WHEN o.state IS DISTINCT FROM n.state THEN 'changed'
                 ELSE 'unchanged' END AS diff_class
        FROM s_new n FULL OUTER JOIN s_old o USING (user_id)
    """,
    doc=(
        "CDC snapshot diff: the changelog's latest-state-per-key "
        "snapshot at the mid-range cut-off T1 full-outer-joined against "
        "the snapshot at T2 (= now), classifying every key as added / "
        "changed / unchanged with before/after states — the table-diff "
        "audit run before promoting a rebuilt serving table. Two "
        "keyed window compactions + one keyed join; no global state. "
        "('removed' cannot occur in an append-only changelog and is "
        "structurally absent.)"
    ),
    tags=("cdc", "audit", "join"),
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "us", F.expr("unix_micros(ts)")
    )
    cut = e.agg(
        F.expr(
            "min(unix_micros(ts)) + (max(unix_micros(ts)) - min(unix_micros(ts))) div 2"
        ).alias("tc")
    )

    def snap(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )

    old = snap(e.join(F.broadcast(cut)).filter(F.col("us") <= F.col("tc")))
    new = snap(e)
    return (
        new.withColumnRenamed("state", "state_new")
        .join(
            old.withColumnRenamed("state", "state_old"),
            "user_id",
            "full_outer",
        )
        .select(
            "user_id",
            "state_old",
            "state_new",
            F.when(F.col("state_old").isNull(), "added")
            .when(
                ~F.col("state_old").eqNullSafe(F.col("state_new")), "changed"
            )
            .otherwise("unchanged")
            .alias("diff_class"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension quality
# ---------------------------------------------------------------------------

_MRL_PREFIXES = (8, 16, 32, 64)
_EMB_DIM = 64


def _energy_duck(k: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {k + 1}),"
        " i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
    )


@register(
    "q_emb_matryoshka_quality",
    oracle=f"""
        WITH per_vec AS (
            SELECT vec_id,
                   {", ".join(f"{_energy_duck(k)} AS e{k}" for k in _MRL_PREFIXES)}
            FROM embeddings
        ),
        ratios AS (
            SELECT vec_id, {
                ", ".join(
                    f"CAST(ROUND(e{k} / e{_EMB_DIM}, 9) AS DECIMAL(12,9)) AS r{k},"
                    f" CAST(ROUND(SQRT(e{k} / e{_EMB_DIM}), 9) AS DECIMAL(12,9)) AS c{k}"
                    for k in _MRL_PREFIXES
                )
            }
            FROM per_vec
        )
        SELECT k AS prefix_dim, n, avg_energy_ratio, avg_prefix_cosine
        FROM (
            {" UNION ALL ".join(
                f"SELECT {k} AS k, COUNT(*) AS n,"
                f" CAST(AVG(r{k}) AS DOUBLE) AS avg_energy_ratio,"
                f" CAST(AVG(c{k}) AS DOUBLE) AS avg_prefix_cosine FROM ratios"
                for k in _MRL_PREFIXES
            )}
        )
    """,
    doc=(
        "Matryoshka-representation quality curve (Kusupati et al. "
        "2022): for each prefix length k in (8, 16, 32, 64), the "
        "corpus-average retained-energy ratio ||x[:k]||²/||x||² and "
        "prefix cosine ||x[:k]||/||x|| (= cosine between the truncated "
        "and full vector) — the measurement that justifies a cheap "
        "truncated-dim first pass in front of full-dim re-ranking. "
        "Parity: per-vector ratios quantize to 9 dp decimal before the "
        "exact decimal average, so partition order cannot drift the "
        "float sum. Scale: one narrow scan, map-side expressions, a "
        "4-row output."
    ),
    tags=("embedding", "quantization", "llm-pipeline"),
)
def q_emb_matryoshka_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")

    def energy(k: int):
        return F.aggregate(
            F.slice(F.col("embedding"), 1, k),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    per = e.select(
        "vec_id", *[energy(k).alias(f"e{k}") for k in _MRL_PREFIXES]
    )
    ratios = per.select(
        "vec_id",
        *[
            F.round(F.col(f"e{k}") / F.col(f"e{_EMB_DIM}"), 9)
            .cast("decimal(12,9)")
            .alias(f"r{k}")
            for k in _MRL_PREFIXES
        ],
        *[
            F.round(F.sqrt(F.col(f"e{k}") / F.col(f"e{_EMB_DIM}")), 9)
            .cast("decimal(12,9)")
            .alias(f"c{k}")
            for k in _MRL_PREFIXES
        ],
    )
    # ONE aggregation pass over the ratio table, per-prefix rows by
    # explode — the prior per-prefix agg union re-ran the energy fold
    # over the corpus once per prefix (r11); per-column avgs identical
    sums = ratios.agg(
        F.count("*").alias("n"),
        *[F.avg(f"r{k}").cast("double").alias(f"ar{k}") for k in _MRL_PREFIXES],
        *[F.avg(f"c{k}").cast("double").alias(f"ac{k}") for k in _MRL_PREFIXES],
    )
    return sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("prefix_dim"),
                        F.col(f"ar{k}").alias("avg_energy_ratio"),
                        F.col(f"ac{k}").alias("avg_prefix_cosine"),
                    )
                    for k in _MRL_PREFIXES
                ]
            )
        ).alias("t"),
        "n",
    ).select("t.prefix_dim", "n", "t.avg_energy_ratio", "t.avg_prefix_cosine")


# ---------------------------------------------------------------------------
# Dedup cluster size histogram
# ---------------------------------------------------------------------------


def _cluster_sizes_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import DEDUP_CLUSTERS_ORACLE

    return f"""
        WITH clusters AS MATERIALIZED ({DEDUP_CLUSTERS_ORACLE}),
        sizes AS (
            SELECT canonical_id, COUNT(*) AS cluster_size
            FROM clusters GROUP BY canonical_id
        )
        SELECT cluster_size,
               COUNT(*) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size
    """


@register(
    "q_dedup_cluster_sizes",
    oracle=_cluster_sizes_oracle(),
    doc=(
        "Duplicate-cluster size profile: histogram of connected-"
        "component sizes over the near-dup graph (cluster size -> how "
        "many clusters, how many docs) plus the singleton count — the "
        "report that sizes a dedup run's blast radius before dropping "
        "anything. Rides the session-cached converged component labels "
        "(one extra bounded groupBy); oracle composes the shared "
        "recursive-CTE cluster text."
    ),
    tags=("dedup", "graph", "audit", "llm-pipeline"),
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_dedup_clusters

    labels = q_dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            (F.count("*") * F.col("cluster_size")).alias("n_docs"),
        )
        .select("cluster_size", "n_clusters", F.col("n_docs").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Deterministic training shards
# ---------------------------------------------------------------------------

_SHARDS = 8
_SHARD_SPARK = (
    "cast(conv(substring(md5(concat('shard:', cast(doc_id as string))), 1, 7),"
    f" 16, 10) as bigint) % {_SHARDS}"
)
_SHARD_DUCK = (
    "CAST('0x' || md5('shard:' || CAST(doc_id AS VARCHAR))[1:7] AS BIGINT)"
    f" % {_SHARDS}"
)
_ORDER_SPARK = "md5(concat('order:', cast(doc_id as string)))"
_ORDER_DUCK = "md5('order:' || CAST(doc_id AS VARCHAR))"


@register(
    "q_pack_shuffle_shards",
    oracle=f"""
        SELECT doc_id, shard_id,
               ROW_NUMBER() OVER (
                   PARTITION BY shard_id ORDER BY ok, doc_id) AS shard_pos,
               n_chars
        FROM (
            SELECT doc_id, n_chars,
                   {_SHARD_DUCK} AS shard_id,
                   {_ORDER_DUCK} AS ok
            FROM documents
        )
    """,
    doc=(
        "Deterministic training-shard assignment + intra-shard shuffle "
        "order: every document hashes to one of 8 shards and to a "
        "stable pseudo-random position inside it (seeded md5 on both "
        "axes, never rand()) — the reproducible data-order contract an "
        "LLM training run needs for resumable epochs and exact "
        "re-runs. Scale: one hash projection + one per-shard window; "
        "shards are the natural write partitioning for the packed "
        "output."
    ),
    tags=("llm-pipeline", "sampling", "layout"),
)
def q_pack_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("shard_id").orderBy("ok", "doc_id")
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.expr(_SHARD_SPARK).alias("shard_id"),
            F.expr(_ORDER_SPARK).alias("ok"),
        )
        .withColumn("shard_pos", F.row_number().over(w))
        .select("doc_id", "shard_id", "shard_pos", "n_chars")
    )


# ---------------------------------------------------------------------------
# Exact discrete percentiles (order statistic, no interpolation)
# ---------------------------------------------------------------------------

_PD_PCTS = (50, 90, 99)


@register(
    "q_agg_percentile_disc",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type, MAX(n) AS n,
               {", ".join(
                   f"MIN(CASE WHEN rn = CAST(CEIL(n * {p} / 100.0) AS BIGINT)"
                   f" THEN value END) AS p{p}_disc"
                   for p in _PD_PCTS
               )}
        FROM ranked GROUP BY event_type
    """,
    doc=(
        "Exact DISCRETE percentiles per group: the order statistic at "
        "rank ceil(p*n/100) — an actual observed value, never an "
        "interpolation (the SLA/latency-reporting convention, and the "
        "complement to q_agg_percentile_exact's continuous form). "
        "Implemented as explicit rank selection with an event_id "
        "tie-break so both engines pick the identical row; one keyed "
        "window + one aggregate, no value collection."
    ),
    tags=("agg", "percentile", "window"),
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for p in _PD_PCTS:
        rank = F.ceil(F.col("n") * p / 100.0).cast("bigint")
        aggs.append(
            F.min(F.when(F.col("rn") == rank, F.col("value"))).alias(
                f"p{p}_disc"
            )
        )
    return ranked.groupBy("event_type").agg(*aggs)


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_TOPK = 10


def _bm25_topk_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave3 import _bm25_oracle

    return f"""
        WITH scored AS MATERIALIZED ({_bm25_oracle()})
        SELECT doc_id, dl, bm25, rank FROM (
            SELECT doc_id, dl, bm25,
                   ROW_NUMBER() OVER (
                       ORDER BY bm25 DESC, doc_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {_BM25_TOPK}
    """


@register(
    "q_text_bm25_topk",
    oracle=_bm25_topk_oracle(),
    doc=(
        "Query-time BM25 retrieval: the top-10 documents for the fixed "
        "3-term query by the corpus BM25 score (composes q_text_bm25's "
        "scoring expression and oracle text verbatim, so the ranking "
        "function cannot drift from the scorer). The global top-k runs "
        "as TakeOrderedAndProject (orderBy+limit — no full sort, no "
        "single-task global window); ranks are then derived on the "
        "k-row result by a bounded better-than self-join, keeping the "
        "plan free of partitionless windows at any corpus size."
    ),
    tags=("text", "ranking", "search", "topk"),
)
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave3 import q_text_bm25

    scored = q_text_bm25(spark, sf_dir)
    top = (
        scored.select("doc_id", "dl", "bm25")
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPK)
    )
    a, b = top.alias("a"), top.alias("b")
    better = (F.col("b.bm25") > F.col("a.bm25")) | (
        (F.col("b.bm25") == F.col("a.bm25"))
        & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    return (
        a.join(b, better, "left")
        .groupBy(F.col("a.doc_id"), F.col("a.dl"), F.col("a.bm25"))
        .agg((F.count(F.col("b.doc_id")) + 1).alias("rank"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.dl").alias("dl"),
            F.col("a.bm25").alias("bm25"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
