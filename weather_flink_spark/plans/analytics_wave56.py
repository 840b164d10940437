"""Wave-56 operator (round 9): the 100-query binary-tier recall PANEL
— de-noising the searcher quality surface.

Every searcher recall gate so far reads 5 queries x 5 hits, so one
flipped hit moves the mean by 0.04 and per-query scatter of ±0.2 is
routine — the "noise-dominated recall gates" residual every verdict
since r6 has carried. This round's sampled-thermometer work made the
cost concrete: at sf0.1 the 5-query gate read sampled 0.56 vs exact
0.68 while this 100-query panel reads 0.744 vs 0.736 — the SMALL
panel inverted the real ordering.

``q_sim_recall_panel`` is the statistically meaningful read, as a
first-class oracle-exact entry: recall@5 over a 100-query panel
(vec_id < 100 — 20x the gate panel) for the three exhaustive-scan
binary tiers plus the IVF cell searcher at its digit-scaled probe
count (nprobe = d-1, r10 verdict task #5), one output row per tier:

- ``binary64``    — wave-43 sign-bit codes, fixed top-20 pool;
- ``binary256``   — wave-49 exact-quintile thermometer codes,
  digit-scaled top-10(d-1) pool;
- ``binary256_sampled`` — wave-49's sampled-model codes, same pool;
- ``ivf``         — exact cosine within the query's top-(d-1)
  trained cells (2 at the d=3 fixture — the pre-r11 constant; 3 at
  sf0.1, where the panel measured the fixed nprobe=2 as the cell-miss
  ceiling: 0.474 -> 0.608 scaled; quantifies the cell-miss rate the
  graph upgrade was driven by: ~35% of true neighbors share the
  query's top cell here).

Each tier runs the SAME scan shape its gate entry uses (Hamming scan
-> top-pool by (hamming asc, vec_id asc) -> exact cosine rerank to
top-5) against a panel-sized exact ground truth (session-cached
``exact_topk_panel``). The graph tiers (flat, HNSW, IVF/IVFPQ) are
deliberately not in the panel: their unrolled beam oracles replayed at
100 queries would dominate the correctness gate's runtime; the binary
tiers are the cheap exhaustive scans where a 20x panel costs almost
nothing on either engine.

Scale: the panel is a bounded broadcast query side (100 rows) against
the code tables the index already persists; at 100 TB this is the
standard recall-audit job run against a corpus sample, never
corpus x corpus.

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

N_PANEL = 100
PANEL_K = 5


def exact_topk_panel_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached exact cosine top-5 for the 100-query panel —
    the panel's ground truth (the shared exact_topk_table covers only
    the 5 gate queries)."""
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import _cached, dot_col

    def build() -> DataFrame:
        a = ivf_assigned_table(spark, sf_dir)
        q = a.filter(F.col("vec_id") < N_PANEL).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        cos = dot_col(F.col("q_emb"), F.col("embedding")) / (
            F.col("q_nrm") * F.col("nrm")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id").asc()
        )
        res = (
            a.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("k_rank", F.row_number().over(w))
            .filter(F.col("k_rank") <= PANEL_K)
            .select("query_id", "vec_id")
            .persist()
        )
        res.count()
        return res

    return _cached("exact_topk_panel", spark, sf_dir, build)


def _tier_recall(
    spark: SparkSession,
    sf_dir: str,
    codes: DataFrame,
    words: list[str],
    pool: int,
    tier: str,
) -> DataFrame:
    """One panel row: run the tier's Hamming-scan + rerank searcher
    over the 100-query panel and score against the exact panel."""
    from weather_flink_spark.plans.llm_pipeline import dot_col

    q = codes.filter(F.col("vec_id") < N_PANEL).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(w).alias(f"q_{w}") for w in words],
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    hamming = sum(
        F.bit_count(F.col(f"q_{w}").bitwiseXOR(F.col(w))) for w in words
    )
    w_ham = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    cand = (
        codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            hamming.alias("hamming"),
            "embedding",
            "nrm",
            "q_emb",
            "q_nrm",
        )
        .withColumn("rk", F.row_number().over(w_ham))
        .filter(F.col("rk") <= pool)
    )
    cos = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    top = (
        cand.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("k", F.row_number().over(w_cos))
        .filter(F.col("k") <= PANEL_K)
        .select("query_id", "vec_id")
    )
    gt = exact_topk_panel_table(spark, sf_dir)
    hits = gt.join(top, ["query_id", "vec_id"]).agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    return hits.select(
        F.lit(tier).alias("tier"),
        F.lit(N_PANEL).cast("bigint").alias("n_queries"),
        "n_hits",
        (
            F.col("n_hits").cast("double") / F.lit(N_PANEL * PANEL_K)
        ).alias("recall_at_5"),
    )


def _ivf_tier_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One panel row for the IVF searcher at the digit-scaled probe
    count: probe each panel query's top-(d-1) trained cells, exact
    cosine among their members, top-5, scored on the panel ground
    truth."""
    from weather_flink_spark.plans.analytics_wave4 import (
        _kmeans_dist_col,
        kmeans_final_assignment,
    )
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits
    from weather_flink_spark.plans.similarity_extra import ivf_nprobe
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import dot_col

    assigned = ivf_assigned_table(spark, sf_dir)
    cent, _ = kmeans_final_assignment(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < N_PANEL).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            "cid",
            _kmeans_dist_col("q_emb", "c").alias("cd2"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= ivf_nprobe(corpus_digits(spark, sf_dir)))
        .select("query_id", "q_emb", "q_nrm", F.col("cid").alias("probe_cell"))
    )
    cos = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    top = (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("k", F.row_number().over(w_rank))
        .filter(F.col("k") <= PANEL_K)
        .select("query_id", "vec_id")
    )
    gt = exact_topk_panel_table(spark, sf_dir)
    hits = gt.join(top, ["query_id", "vec_id"]).agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    return hits.select(
        F.lit("ivf").alias("tier"),
        F.lit(N_PANEL).cast("bigint").alias("n_queries"),
        "n_hits",
        (
            F.col("n_hits").cast("double") / F.lit(N_PANEL * PANEL_K)
        ).alias("recall_at_5"),
    )


def _thermo_sql(p: str, sample_pred: str) -> str:
    """Prefixed thermometer-code CTE chain ending in ``{p}bq`` (vec_id,
    w0..w3) — the wave-49 replay with every CTE name prefixed so the
    exact and sampled instances can coexist in ONE oracle."""
    from weather_flink_spark.plans.analytics_wave49 import (
        _DIMS,
        _DIMS_PER_WORD,
    )

    sh = f"(4 * (t.dim % {_DIMS_PER_WORD}) + t.k - 1)"
    bit = (
        f"CASE WHEN {sh} = 63 THEN (-9223372036854775807 - 1)"
        f" ELSE CAST(1 AS BIGINT) << {sh} END"
    )
    words = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN (t.dim // {_DIMS_PER_WORD}) = {w}"
        f" AND e.v > t.thr THEN {bit} ELSE 0 END) AS BIGINT) AS w{w}"
        for w in range(4)
    )
    return f"""
        {p}vals AS MATERIALIZED (
            SELECT vec_id,
                   UNNEST(range(1, {_DIMS + 1})) - 1 AS dim,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        {p}nn AS (SELECT COUNT(*) AS n FROM embeddings WHERE {sample_pred}),
        {p}thr AS MATERIALIZED (
            SELECT r.dim, q.k, r.v AS thr
            FROM (
                SELECT vec_id, dim, v,
                       ROW_NUMBER() OVER (
                           PARTITION BY dim
                           ORDER BY v ASC, vec_id ASC) AS rn
                FROM {p}vals WHERE {sample_pred}
            ) r
            JOIN (VALUES (1), (2), (3), (4)) q(k)
              ON r.rn = (q.k * (SELECT n FROM {p}nn)) // 5
        ),
        {p}bq AS MATERIALIZED (
            SELECT e.vec_id,
                   {words}
            FROM {p}vals e JOIN {p}thr t ON t.dim = e.dim
            GROUP BY e.vec_id
        )"""


def panel_exact_cte() -> str:
    """CTE fragment ending in ``panel_exact`` (query_id, vec_id): the
    100-query exact cosine top-5 ground truth — ONE text shared by this
    oracle and the wave-58 graph-tier panel so the two panels can never
    drift on what "exact" means."""
    from weather_flink_spark.plans.llm_extra import _cos_duck

    return f"""panel_exact AS MATERIALIZED (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC) AS k_rank
                FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
                WHERE q.vec_id < {N_PANEL}
            ) WHERE k_rank <= {PANEL_K}
        )"""


def _tier_sql(tier: str, codes: str, words: list[str], pool: str) -> str:
    """One tier's panel block: Hamming scan -> top-pool -> rerank ->
    recall row."""
    from weather_flink_spark.plans.llm_extra import _cos_duck

    ham = " + ".join(
        f"CAST(bit_count(xor(q.{w}, v.{w})) AS INTEGER)" for w in words
    )
    return f"""
        SELECT '{tier}' AS tier,
               CAST({N_PANEL} AS BIGINT) AS n_queries,
               CAST((
                   SELECT COUNT(*) FROM panel_exact e
                   JOIN (
                       SELECT query_id, vec_id FROM (
                           SELECT c.query_id, c.vec_id,
                                  ROW_NUMBER() OVER (
                                      PARTITION BY c.query_id
                                      ORDER BY {_cos_duck('eq.embedding', 'ev.embedding')} DESC,
                                               c.vec_id ASC) AS k
                           FROM (
                               SELECT query_id, vec_id FROM (
                                   SELECT q.vec_id AS query_id,
                                          v.vec_id AS vec_id,
                                          ROW_NUMBER() OVER (
                                              PARTITION BY q.vec_id
                                              ORDER BY {ham} ASC,
                                                       v.vec_id ASC) AS rk
                                   FROM {codes} q
                                   JOIN {codes} v ON v.vec_id <> q.vec_id
                                   WHERE q.vec_id < {N_PANEL}
                               ) WHERE rk <= {pool}
                           ) c
                           JOIN embeddings eq ON eq.vec_id = c.query_id
                           JOIN embeddings ev ON ev.vec_id = c.vec_id
                       ) WHERE k <= {PANEL_K}
                   ) t ON t.query_id = e.query_id AND t.vec_id = e.vec_id
               ) AS BIGINT) AS n_hits"""


def _ivf_tier_sql() -> str:
    """The IVF panel block at the digit-scaled probe count: probe the
    query's top-(d-1) trained cells (from the sz scalar subquery),
    exact cosine among their members, top-5."""
    from weather_flink_spark.plans.analytics_wave4 import (
        KMEANS_ITERS,
        _kmeans_dist_duck,
    )
    from weather_flink_spark.plans.llm_extra import _cos_duck
    from weather_flink_spark.plans.similarity_extra import IVF_NPROBE_SQL

    return f"""
        ivfprobes AS MATERIALIZED (
            SELECT query_id, probe_cell FROM (
                SELECT q.vec_id AS query_id, c.cid AS probe_cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_kmeans_dist_duck('q.embedding', 'c.c')} ASC,
                                    c.cid ASC) AS rn
                FROM embeddings q CROSS JOIN cent{KMEANS_ITERS} c
                WHERE q.vec_id < {N_PANEL}
            ) WHERE rn <= {IVF_NPROBE_SQL}
        ),
        t_ivf AS MATERIALIZED (
            SELECT 'ivf' AS tier,
                   CAST({N_PANEL} AS BIGINT) AS n_queries,
                   CAST((
                       SELECT COUNT(*) FROM panel_exact e
                       JOIN (
                           SELECT query_id, vec_id FROM (
                               SELECT p.query_id, v.vec_id,
                                      ROW_NUMBER() OVER (
                                          PARTITION BY p.query_id
                                          ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                                   v.vec_id ASC) AS k
                               FROM ivfprobes p
                               JOIN assigned v
                                 ON v.cell = p.probe_cell
                                AND v.vec_id <> p.query_id
                               JOIN embeddings q ON q.vec_id = p.query_id
                           ) WHERE k <= {PANEL_K}
                       ) t ON t.query_id = e.query_id
                          AND t.vec_id = e.vec_id
                   ) AS BIGINT) AS n_hits
        )"""


def _panel_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave20 import SZ_CTE
    from weather_flink_spark.plans.analytics_wave43 import (
        _BQ_CAND,
        _bq_codes_cte,
    )
    from weather_flink_spark.plans.analytics_wave49 import (
        _B256_CAND_SQL,
        _TS_PRED_DUCK,
    )
    from weather_flink_spark.plans.llm_extra import ivf_assigned_cte

    tiers = ",\n".join(
        f"t_{t} AS MATERIALIZED ({sql})"
        for t, sql in [
            (
                "binary64",
                _tier_sql("binary64", "bq", ["b_lo", "b_hi"], str(_BQ_CAND)),
            ),
            (
                "binary256",
                _tier_sql("binary256", "ebq", ["w0", "w1", "w2", "w3"], _B256_CAND_SQL),
            ),
            (
                "binary256_sampled",
                _tier_sql("binary256_sampled", "sbq", ["w0", "w1", "w2", "w3"], _B256_CAND_SQL),
            ),
        ]
    )
    return f"""
        WITH {ivf_assigned_cte()},
        {_bq_codes_cte()},
        {_thermo_sql('e', 'TRUE')},
        {_thermo_sql('s', _TS_PRED_DUCK)},
        {SZ_CTE},
        {panel_exact_cte()},
        {tiers},
        {_ivf_tier_sql()}
        SELECT tier, n_queries, n_hits,
               CAST(n_hits AS DOUBLE) / ({N_PANEL} * {PANEL_K})
                   AS recall_at_5
        FROM (
            SELECT * FROM t_binary64
            UNION ALL SELECT * FROM t_binary256
            UNION ALL SELECT * FROM t_binary256_sampled
            UNION ALL SELECT * FROM t_ivf
        )
    """


@register(
    "q_sim_recall_panel",
    oracle=_panel_oracle(),
    doc=(
        "100-query recall@5 panel over the three exhaustive-scan "
        "binary ANN tiers (r9): sign-bit 64 (top-20 pool), exact-"
        "quintile thermometer 256 and sampled-model thermometer 256 "
        "(digit-scaled top-10(d-1) pools) plus the IVF cell searcher "
        "at its digit-scaled probe count (nprobe = d-1, r11) — each "
        "run with its gate "
        "entry's exact scan shape against a panel-sized exact ground "
        "truth. 20x the gate panel, so one flipped hit moves recall "
        "by 0.002 instead of 0.04 — the statistically meaningful "
        "searcher-quality surface (measured r9 at sf0.1: the 5-query "
        "gate read sampled 0.56 vs exact 0.68; this panel reads "
        "0.744 vs 0.736 — binary64 0.326). Oracle replays all three code builds, "
        "scans, reranks, and the panel ground truth in one SQL."
    ),
    tags=("similarity", "ann", "evaluation", "quantization"),
)
def q_sim_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import _cached

    # 4-row result cached per session: the r10 frontier entry re-reads
    # these rows, so the code scans must not re-run per consumer
    return _cached(
        "panel_rows_bin",
        spark,
        sf_dir,
        lambda: _binary_panel(spark, sf_dir).transform(snapshot()),
    )


def _binary_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits
    from weather_flink_spark.plans.analytics_wave43 import (
        _BQ_CAND,
        binary_codes_table,
    )
    from weather_flink_spark.plans.analytics_wave49 import (
        _b256_cand,
        thermo_codes_sampled_table,
        thermo_codes_table,
    )

    d = corpus_digits(spark, sf_dir)
    rows = [
        _tier_recall(
            spark,
            sf_dir,
            binary_codes_table(spark, sf_dir),
            ["b_lo", "b_hi"],
            _BQ_CAND,
            "binary64",
        ),
        _tier_recall(
            spark,
            sf_dir,
            thermo_codes_table(spark, sf_dir),
            ["w0", "w1", "w2", "w3"],
            _b256_cand(d),
            "binary256",
        ),
        _tier_recall(
            spark,
            sf_dir,
            thermo_codes_sampled_table(spark, sf_dir),
            ["w0", "w1", "w2", "w3"],
            _b256_cand(d),
            "binary256_sampled",
        ),
        _ivf_tier_recall(spark, sf_dir),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
