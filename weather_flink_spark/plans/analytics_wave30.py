"""Wave-30 operators (round 6, continued): point-in-time feature
assembly and time-series similarity search.

- ``q_feature_pit_join`` — point-in-time training-set assembly, the
  leakage-free feature join every supervised pipeline needs: each
  'purchase' event is a label row, and its features are computed from
  the user's history STRICTLY BEFORE the label timestamp (running
  conditional counts, last prior view value, seconds since the
  previous event) — all from ONE user_id sort with
  ...ROWS UNBOUNDED PRECEDING AND 1 PRECEDING frames, never a
  self-join, never a future-looking row. Feature leakage is the
  classic silent killer of offline metrics; the 1-PRECEDING frame IS
  the guarantee.
- ``q_ts_profile_similarity`` — time-series similarity search (the
  EDBT'19 streaming-similarity shape, batch form): every user's
  activity collapses to a dense 24-dim hour-of-day profile
  (decimal-exact means, absent hours = 0), the query user's profile
  is Pearson-correlated against every candidate's from exact decimal
  moment sums (one double op per candidate at the end), and the top-5
  most-similar users come back via TakeOrdered. At 100 TB the
  profiles are fixed-dim vectors — the LSH/IVF searchers
  (q_sim_ann_*) index them; this entry is the exact scoring kernel
  those indexes approximate.
- ``q_rag_e2e_retrieval`` — the RAG ingest+serve kernel in one plan:
  overlapping token chunks → hashed bag-of-words INTEGER vectors →
  cosine top-k for a query chunk, exact integer dot/norm sums with
  one double per candidate at the end. The norm is deliberately the
  candidate's FULL norm (the dot's join restricts to the query's
  bucket support; the norm must not — caught by the numpy twin test,
  not the oracle, since both engines agreed on the wrong formula:
  oracles prove parity, twins prove semantics).

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# point-in-time feature assembly
# ---------------------------------------------------------------------------


@register(
    "q_feature_pit_join",
    oracle="""
        WITH feats AS (
            SELECT user_id, event_id, ts, event_type, value,
                   epoch_us(ts) AS t_us,
                   COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w
                       AS n_views_before,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w
                       AS n_clicks_before,
                   COUNT(CASE WHEN event_type = 'error' THEN 1 END) OVER w
                       AS n_errors_before,
                   LAST_VALUE(CASE WHEN event_type = 'view' THEN value END
                              IGNORE NULLS) OVER w AS last_view_value,
                   LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_t_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id AS label_id, value AS label_value,
               n_views_before, n_clicks_before, n_errors_before,
               last_view_value,
               t_us - prev_t_us AS micros_since_prev
        FROM feats WHERE event_type = 'purchase'
    """,
    doc=(
        "Point-in-time training-set assembly (the leakage-free feature "
        "join): each 'purchase' event is a label row whose features — "
        "running per-type counts, last prior view value, micros since "
        "the previous event — come exclusively from the user's history "
        "STRICTLY BEFORE the label, enforced by the ROWS ... AND 1 "
        "PRECEDING frame on ONE user_id sort. No self-join, no asof "
        "per feature table, no future-looking row: the frame boundary "
        "IS the leakage guarantee offline/online parity depends on. "
        "Scale: one shuffle on user_id serves every feature column; "
        "feature count grows the projection, never the pass count. "
        "The time delta is pure integer epoch-micros arithmetic; the "
        "last-view value is a double passthrough — nothing to drift."
    ),
    tags=("ml-pipeline", "window", "features"),
)
def q_feature_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.expr("unix_micros(ts)")
    feats = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        t_us.alias("t_us"),
        F.count(
            F.when(F.col("event_type") == "view", 1)
        ).over(w).alias("n_views_before"),
        F.count(
            F.when(F.col("event_type") == "click", 1)
        ).over(w).alias("n_clicks_before"),
        F.count(
            F.when(F.col("event_type") == "error", 1)
        ).over(w).alias("n_errors_before"),
        F.last(
            F.when(F.col("event_type") == "view", F.col("value")),
            ignorenulls=True,
        ).over(w).alias("last_view_value"),
        F.lag(t_us).over(wl).alias("prev_t_us"),
    )
    return feats.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("label_id"),
        F.col("value").alias("label_value"),
        "n_views_before",
        "n_clicks_before",
        "n_errors_before",
        "last_view_value",
        (F.col("t_us") - F.col("prev_t_us")).alias("micros_since_prev"),
    )


# ---------------------------------------------------------------------------
# time-series profile similarity search
# ---------------------------------------------------------------------------

_TSS_TOPK = 5


@register(
    "q_ts_profile_similarity",
    oracle=f"""
        WITH grid AS (
            SELECT u.user_id, h.hod
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT UNNEST(range(0, 24)) AS hod) h
        ),
        cells AS (
            SELECT user_id, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*) AS m
            FROM events GROUP BY 1, 2
        ),
        prof AS MATERIALIZED (
            -- dense 24-dim profile; absent hours = 0; ONE rounding
            SELECT g.user_id, g.hod,
                   CAST(ROUND(COALESCE(c.m, 0.0), 6) AS DECIMAL(12,6)) AS p
            FROM grid g LEFT JOIN cells c
              ON c.user_id = g.user_id AND c.hod = g.hod
        ),
        q AS MATERIALIZED (
            SELECT hod, p FROM prof
            WHERE user_id = (SELECT MIN(user_id) FROM prof)
        ),
        moments AS (
            -- exact decimal moment sums per candidate; Pearson corr is
            -- assembled from them with one double expression at the end
            SELECT pr.user_id,
                   SUM(pr.p) AS sx, SUM(q.p) AS sy,
                   SUM(pr.p * pr.p) AS sxx, SUM(q.p * q.p) AS syy,
                   SUM(pr.p * q.p) AS sxy
            FROM prof pr JOIN q ON q.hod = pr.hod
            WHERE pr.user_id <> (SELECT MIN(user_id) FROM prof)
            GROUP BY pr.user_id
        )
        SELECT user_id,
               ROUND((24.0 * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / SQRT((24.0 * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (24.0 * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                     9) AS corr
        FROM moments
        ORDER BY corr DESC, user_id ASC
        LIMIT {_TSS_TOPK}
    """,
    doc=(
        "Time-series similarity search over per-user activity "
        "profiles: every user collapses to a dense 24-dim hour-of-day "
        "mean-value vector (decimal-exact means, absent hours = 0, one "
        "rounding at definition), the min-id query user is Pearson-"
        "correlated against every candidate from exact DECIMAL moment "
        "sums (sx/sy/sxx/syy/sxy — partial-aggregated, order-free), "
        f"and the top-{_TSS_TOPK} most-similar users return via "
        "TakeOrderedAndProject (corr DESC, user ASC tie-break). Scale: "
        "the profile build is one groupBy on (user, hod); the query "
        "side is 24 broadcast rows, so scoring is map-side per "
        "candidate; at 100 TB the profiles are exactly the fixed-dim "
        "vectors the ANN searchers (q_sim_ann_*) index — this entry "
        "is the exact kernel those indexes approximate."
    ),
    tags=("timeseries", "similarity", "search"),
)
def q_ts_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid = users.crossJoin(
        load(spark, sf_dir, "events")
        .sparkSession.range(24)
        .select(F.col("id").cast("int").alias("hod"))
    )
    cells = e.groupBy(
        "user_id", F.hour("ts").alias("hod")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("m")
    )
    prof = grid.join(cells, ["user_id", "hod"], "left").select(
        "user_id",
        "hod",
        F.round(F.coalesce(F.col("m"), F.lit(0.0)), 6)
        .cast("decimal(12,6)")
        .alias("p"),
    )
    qmin = users.agg(F.min("user_id").alias("qid"))
    q = (
        prof.join(F.broadcast(qmin), prof.user_id == F.col("qid"))
        .select("hod", F.col("p").alias("qp"))
    )
    moments = (
        prof.join(F.broadcast(qmin), prof.user_id == F.col("qid"), "left_anti")
        .join(F.broadcast(q), "hod")
        .groupBy("user_id")
        .agg(
            F.sum("p").alias("sx"),
            F.sum("qp").alias("sy"),
            F.sum(F.col("p") * F.col("p")).alias("sxx"),
            F.sum(F.col("qp") * F.col("qp")).alias("syy"),
            F.sum(F.col("p") * F.col("qp")).alias("sxy"),
        )
    )
    corr = F.round(
        (
            F.lit(24.0) * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / F.sqrt(
            (
                F.lit(24.0) * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            * (
                F.lit(24.0) * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double")
            )
        ),
        9,
    )
    return (
        moments.select("user_id", corr.alias("corr"))
        .orderBy(F.col("corr").desc(), F.col("user_id").asc())
        .limit(_TSS_TOPK)
    )


# ---------------------------------------------------------------------------
# end-to-end RAG retrieval kernel (chunk -> vectorize -> top-k)
# ---------------------------------------------------------------------------

_RAG_CHUNK = 32  # tokens per chunk
_RAG_STRIDE = 24  # tokens between chunk starts (8-token overlap)
_RAG_B = 16  # hashed bag-of-words dimensionality
_RAG_TOPK = 5

_RAG_TOKB_SPARK = (
    "pmod(cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint), "
    f"{_RAG_B})"
)
_RAG_TOKB_DUCK = f"CAST('0x' || md5(t)[1:15] AS BIGINT) % {_RAG_B}"


@register(
    "q_rag_e2e_retrieval",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, s AS chunk_start,
                   tok[s : s + {_RAG_CHUNK} - 1] AS ctok
            FROM tok,
                 UNNEST(range(1, GREATEST(len(tok) - {_RAG_CHUNK} + 2, 2),
                              {_RAG_STRIDE})) AS r(s)
            WHERE len(tok) >= {_RAG_CHUNK}
        ),
        tvec AS (
            -- hashed bag-of-words: integer counts per bucket
            SELECT doc_id, chunk_start, {_RAG_TOKB_DUCK} AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, chunk_start, UNNEST(ctok) AS t FROM chunks)
            GROUP BY 1, 2, 3
        ),
        q AS MATERIALIZED (
            SELECT b, c FROM tvec
            WHERE doc_id = (SELECT MIN(doc_id) FROM chunks)
              AND chunk_start = 1
        ),
        qn AS (SELECT SUM(c * c) AS qq FROM q),
        norms AS (
            -- FULL candidate norm over all its buckets — the dot's
            -- inner join restricts to the query's support, the norm
            -- must not
            SELECT doc_id, chunk_start, SUM(c * c) AS vv
            FROM tvec GROUP BY 1, 2
        ),
        scored AS (
            SELECT v.doc_id, v.chunk_start,
                   SUM(v.c * q.c) AS dot
            FROM tvec v JOIN q ON q.b = v.b
            WHERE v.doc_id <> (SELECT MIN(doc_id) FROM chunks)
            GROUP BY 1, 2
        )
        SELECT s.doc_id, s.chunk_start,
               ROUND(CAST(s.dot AS DOUBLE)
                     / SQRT(CAST(n.vv AS DOUBLE) * CAST(qn.qq AS DOUBLE)),
                     9) AS cosine
        FROM scored s
        JOIN norms n ON n.doc_id = s.doc_id AND n.chunk_start = s.chunk_start
        CROSS JOIN qn
        ORDER BY cosine DESC, s.doc_id ASC, s.chunk_start ASC
        LIMIT {_RAG_TOPK}
    """,
    doc=(
        "End-to-end RAG retrieval kernel — chunk, vectorize, retrieve "
        "in one plan: documents split into "
        f"{_RAG_CHUNK}-token chunks at stride {_RAG_STRIDE} (the "
        "q_text_chunk_overlap shape), each chunk collapses to a "
        f"{_RAG_B}-bucket hashed bag-of-words of INTEGER counts, and "
        "the query chunk (min-doc first chunk, own doc excluded) "
        f"retrieves its top-{_RAG_TOPK} chunks by cosine — integer "
        "dot/norm sums end to end, ONE double expression per "
        "candidate at the end, (cosine DESC, doc, chunk) "
        "deterministic tie-break. This wires the ingest+serve path "
        "the dedicated entries cover piecewise (chunking, hashing "
        "trick, cosine top-k, ANN indexes): at 100 TB the tvec table "
        "is the persisted chunk index, the query side is B broadcast "
        "rows, and the scan is an equi-join on the bucket key — the "
        "IVF/LSH searchers replace the linear scan, nothing else "
        "changes."
    ),
    tags=("text", "similarity", "rag", "llm-pipeline"),
)
def q_rag_e2e_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok"),
    ).where(F.expr(f"size(tok) >= {_RAG_CHUNK}"))
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(1, greatest(size(tok) - {_RAG_CHUNK} + 1, 1),"
                f" {_RAG_STRIDE})"
            )
        ).alias("chunk_start"),
        "tok",
    ).select(
        "doc_id",
        "chunk_start",
        F.expr(f"slice(tok, chunk_start, {_RAG_CHUNK})").alias("ctok"),
    )
    tvec = (
        chunks.select(
            "doc_id", "chunk_start", F.explode("ctok").alias("t")
        )
        .select(
            "doc_id",
            "chunk_start",
            F.expr(_RAG_TOKB_SPARK).alias("b"),
        )
        .groupBy("doc_id", "chunk_start", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    qdoc = chunks.agg(F.min("doc_id").alias("qdoc"))
    q = (
        tvec.join(
            F.broadcast(qdoc),
            (tvec.doc_id == F.col("qdoc")) & (tvec.chunk_start == 1),
        )
        .select(F.col("b").alias("qb"), F.col("c").alias("qc"))
    )
    qn = q.agg(F.sum(F.col("qc") * F.col("qc")).alias("qq"))
    # full candidate norms — the dot's join restricts to the query's
    # bucket support, the norm must not
    norms = tvec.groupBy("doc_id", "chunk_start").agg(
        F.sum(F.col("c") * F.col("c")).alias("vv")
    )
    scored = (
        tvec.join(F.broadcast(qdoc), tvec.doc_id == F.col("qdoc"), "left_anti")
        .join(F.broadcast(q), F.col("b") == F.col("qb"))
        .groupBy("doc_id", "chunk_start")
        .agg(F.sum(F.col("c") * F.col("qc")).alias("dot"))
        .join(norms, ["doc_id", "chunk_start"])
    )
    return (
        scored.crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            "chunk_start",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("vv").cast("double") * F.col("qq").cast("double")
                ),
                9,
            ).alias("cosine"),
        )
        .orderBy(
            F.col("cosine").desc(),
            F.col("doc_id").asc(),
            F.col("chunk_start").asc(),
        )
        .limit(_RAG_TOPK)
    )
