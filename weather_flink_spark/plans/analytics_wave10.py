"""Wave-10 operators (round 3): experimentation variance reduction,
embedding-distribution drift, dedup keep-lists, and MMR re-ranking.

- ``q_stats_cuped`` — CUPED variance reduction (the standard
  experimentation-platform adjustment): per-user pre/post-period means,
  theta = cov(pre, post)/var(pre) from exact quantized moments, and the
  achieved variance reduction of the adjusted metric — all from ONE
  pass of per-user aggregates, no second scan.
- ``q_emb_centroid_drift`` — per-label embedding-distribution drift:
  cosine and squared L2 distance between each label's mean vector and the
  global mean (squared L2 stays exact decimal — no sqrt, no rounding
  tie) — the domain-shift audit run before mixing embedding sources
  (per-dimension partial aggregation; means quantized to 6 dp before
  any cross-engine product).
- ``q_dedup_keep_list`` — canonical-document selection per near-dup
  cluster: within each connected component of the near-duplicate graph
  keep the longest document (n_chars, doc_id tie-break) — the actual
  keep/drop decision list a dedup pass emits, riding the session-cached
  converged cluster labels and composing its oracle on the recursive-CTE
  cluster oracle.
- ``q_sim_mmr_diversify`` — Maximal Marginal Relevance re-ranking of
  each query's in-cell candidates (lambda = 0.7, k = 4 selections from
  the top-8 by cosine): the greedy argmax steps are UNROLLED into
  deterministic relational stages on BOTH engines, so even this
  classically "iterative" operator is oracle-checked rather than
  rows-only.

Parity discipline as everywhere (plans/registry.py): exact DECIMAL
moments quantized once at definition, identical double-op order,
deterministic tie-breaks, identical aliases both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16"  # pre-period < cut <= post-period


@register(
    "q_stats_cuped",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   ROUND(CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                              THEN CAST(value AS DECIMAL(14,6)) END) AS DOUBLE)
                         / SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                               THEN 1 ELSE 0 END), 6) AS pre,
                   ROUND(CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                              THEN CAST(value AS DECIMAL(14,6)) END) AS DOUBLE)
                         / SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                               THEN 1 ELSE 0 END), 6) AS post
            FROM events GROUP BY user_id
            HAVING SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                       THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                       THEN 1 ELSE 0 END) > 0
        ),
        m AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(pre AS DECIMAL(18,6))) AS sp,
                   SUM(CAST(post AS DECIMAL(18,6))) AS sy,
                   SUM(CAST(pre AS DECIMAL(18,6))
                       * CAST(pre AS DECIMAL(18,6))) AS spp,
                   SUM(CAST(post AS DECIMAL(18,6))
                       * CAST(post AS DECIMAL(18,6))) AS syy,
                   SUM(CAST(pre AS DECIMAL(18,6))
                       * CAST(post AS DECIMAL(18,6))) AS spy
            FROM per_user
        ),
        s AS (
            SELECT n,
                   ROUND((CAST(spy AS DOUBLE)
                          - CAST(sp AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                         / (n - 1.0), 6) AS cov_py,
                   ROUND((CAST(spp AS DOUBLE)
                          - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)
                         / (n - 1.0), 6) AS var_p,
                   ROUND((CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                         / (n - 1.0), 6) AS var_y
            FROM m
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               ROUND(cov_py / var_p, 6) AS theta,
               var_y AS var_post,
               ROUND(var_y - cov_py * cov_py / var_p, 6) AS var_adjusted,
               ROUND((cov_py * cov_py / var_p) / var_y, 6) AS var_reduction
        FROM s
    """,
    doc=(
        "CUPED variance reduction (Deng et al. 2013, the standard "
        "experimentation adjustment): per-user pre/post-period mean "
        "values (quantized to 6 dp so the cross-user moment sums are "
        "exact DECIMAL on both engines), theta = cov(pre,post)/var(pre), "
        "and the achieved variance of the adjusted metric "
        "var(post) - cov^2/var(pre) computed from the SAME moments in "
        "identical op order — no second pass over the data. Scale: one "
        "conditional-aggregation groupBy(user) then one global moment "
        "rollup (map-side partial, 6 numbers per task)."
    ),
    tags=("statistics", "experimentation"),
)
def q_stats_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    vd = F.col("value").cast("decimal(14,6)")
    pre_n = F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
    post_n = F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("ts") < cut, vd)).cast("double") / pre_n, 6
            ).alias("pre"),
            F.round(
                F.sum(F.when(F.col("ts") >= cut, vd)).cast("double") / post_n, 6
            ).alias("post"),
            pre_n.alias("n_pre"),
            post_n.alias("n_post"),
        )
        .where((F.col("n_pre") > 0) & (F.col("n_post") > 0))
    )
    p6 = F.col("pre").cast("decimal(18,6)")
    y6 = F.col("post").cast("decimal(18,6)")
    m = per_user.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(p6).alias("sp"),
        F.sum(y6).alias("sy"),
        F.sum(p6 * p6).alias("spp"),
        F.sum(y6 * y6).alias("syy"),
        F.sum(p6 * y6).alias("spy"),
    )
    nd = F.col("n").cast("double")
    cov_py = F.round(
        (F.col("spy").cast("double") - F.col("sp").cast("double") * F.col("sy").cast("double") / nd)
        / (nd - F.lit(1.0)),
        6,
    )
    var_p = F.round(
        (F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp").cast("double") / nd)
        / (nd - F.lit(1.0)),
        6,
    )
    var_y = F.round(
        (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / nd)
        / (nd - F.lit(1.0)),
        6,
    )
    s = m.select(
        "n", cov_py.alias("cov_py"), var_p.alias("var_p"), var_y.alias("var_y")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("cov_py") / F.col("var_p"), 6).alias("theta"),
        F.col("var_y").alias("var_post"),
        F.round(
            F.col("var_y") - F.col("cov_py") * F.col("cov_py") / F.col("var_p"), 6
        ).alias("var_adjusted"),
        F.round(
            (F.col("cov_py") * F.col("cov_py") / F.col("var_p")) / F.col("var_y"), 6
        ).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroid drift
# ---------------------------------------------------------------------------


@register(
    "q_emb_centroid_drift",
    oracle="""
        WITH dims AS (
            SELECT label, i AS dim,
                   CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS v
            FROM embeddings, UNNEST(range(1, 65)) AS r(i)
        ),
        lab AS (
            SELECT label, dim, SUM(v) AS s, COUNT(*) AS n
            FROM dims GROUP BY label, dim
        ),
        labm AS (
            SELECT label, dim, n,
                   CAST(ROUND(CAST(s AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS m
            FROM lab
        ),
        gmean AS (
            SELECT dim,
                   CAST(ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6)
                        AS DECIMAL(18,6)) AS g
            FROM lab GROUP BY dim
        ),
        dots AS (
            SELECT l.label, MIN(l.n) AS n_vecs,
                   SUM(l.m * gl.g) AS dot_lg,
                   SUM(l.m * l.m) AS dot_ll,
                   SUM(gl.g * gl.g) AS dot_gg,
                   SUM(CAST(l.m - gl.g AS DECIMAL(12,6))
                       * CAST(l.m - gl.g AS DECIMAL(12,6))) AS d2
            FROM labm l JOIN gmean gl USING (dim)
            GROUP BY l.label
        )
        SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
               ROUND(CAST(dot_lg AS DOUBLE)
                     / (SQRT(CAST(dot_ll AS DOUBLE))
                        * SQRT(CAST(dot_gg AS DOUBLE))), 6) AS cos_to_global,
               CAST(d2 AS DOUBLE) AS l2sq_to_global
        FROM dots
    """,
    doc=(
        "Per-label embedding-distribution drift: cosine and squared L2 distance "
        "between each label's mean vector and the global mean — the "
        "domain-shift audit run before mixing embedding sources into "
        "one index or training set. Parity: per-dimension sums are "
        "exact DECIMAL; means are quantized to 6 dp BEFORE any product, "
        "so the cross-engine dot products are exact decimal arithmetic "
        "with one final sqrt/round. Scale: posexplode to (label, dim) "
        "is a map-side 64x flatMap with partial aggregation — shuffle "
        "volume is labels x dims rows, independent of corpus size; the "
        "global mean reuses the label partials (no second scan)."
    ),
    tags=("embedding", "statistics", "llm-pipeline"),
)
def q_emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim0", "val"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        # float -> double (exact) -> 6dp round -> decimal: the direct
        # float->decimal cast disagrees between engines in ~0.5% of
        # values (measured); the double round agrees in all 32k probed
        F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    lab = dims.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    labm = lab.select(
        "label",
        "dim",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6)
        .cast("decimal(18,6)")
        .alias("m"),
    )
    glob = lab.groupBy("dim").agg(
        F.round(F.sum("s").cast("double") / F.sum("n"), 6)
        .cast("decimal(18,6)")
        .alias("g")
    )
    j = labm.join(glob, "dim")
    dots = j.groupBy("label").agg(
        F.min("n").alias("n_vecs"),
        F.sum(F.col("m") * F.col("g")).alias("dot_lg"),
        F.sum(F.col("m") * F.col("m")).alias("dot_ll"),
        F.sum(F.col("g") * F.col("g")).alias("dot_gg"),
        # narrow the difference before squaring: (18,6)^2 would need
        # precision 39 > 38 and the engines reduce overflow differently
        F.sum(
            (F.col("m") - F.col("g")).cast("decimal(12,6)")
            * (F.col("m") - F.col("g")).cast("decimal(12,6)")
        ).alias("d2"),
    )
    return dots.select(
        "label",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.round(
            F.col("dot_lg").cast("double")
            / (
                F.sqrt(F.col("dot_ll").cast("double"))
                * F.sqrt(F.col("dot_gg").cast("double"))
            ),
            6,
        ).alias("cos_to_global"),
        F.col("d2").cast("double").alias("l2sq_to_global"),
    )


# ---------------------------------------------------------------------------
# Canonical keep-list per near-duplicate cluster
# ---------------------------------------------------------------------------


def _keep_list_oracle() -> str:
    from weather_flink_spark.plans.llm_pipeline import NEAR_DUP_PAIRS_SQL

    return f"""
        WITH RECURSIVE pairs AS ({NEAR_DUP_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(d, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.d
        ),
        lab AS (SELECT d AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY d),
        scored AS (
            SELECT l.doc_id, l.cluster_id, doc.n_chars
            FROM lab l JOIN documents doc USING (doc_id)
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM scored
        )
        SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(n_chars AS BIGINT) AS n_chars, (rn = 1) AS keep
        FROM ranked WHERE cluster_size >= 2
    """


@register(
    "q_dedup_keep_list",
    oracle=_keep_list_oracle(),
    doc=(
        "Canonical-document selection per near-duplicate cluster — the "
        "keep/drop decision list a dedup pass actually emits: within "
        "each connected component of the MinHash near-dup graph, keep "
        "the longest document (n_chars, doc_id tie-break), drop the "
        "rest. Rides the session-cached converged min-label cluster "
        "assignment (one iterative build per session, many consumers) "
        "and composes its oracle on the recursive-CTE cluster oracle, "
        "so the component rule cannot drift from q_dedup_clusters. "
        "Scale: the selection window partitions by cluster id; only "
        "edge-touched docs (the dup sliver of the corpus) enter it."
    ),
    tags=("dedup", "llm-pipeline"),
)
def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import _cc_labels

    labels = _cc_labels(spark, sf_dir)  # (doc_id, label) — edge-touched docs
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scored = labels.select(
        "doc_id", F.col("label").alias("cluster_id")
    ).join(docs, "doc_id")
    w = Window.partitionBy("cluster_id")
    w_rank = w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("cluster_size", F.count("*").over(w))
        .where(F.col("cluster_size") >= 2)
        .select(
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            (F.col("rn") == 1).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance re-ranking (unrolled greedy steps)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_K = 4  # selections per query
_MMR_N = 8  # candidate pool per query (top-N in-cell by cosine)


def _mmr_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        _cos_duck,
        ivf_assigned_cte,
    )

    lam, om = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 6)
    parts = [
        f"""cand0 AS MATERIALIZED (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   v.embedding AS emb,
                   {_cos_duck('q.embedding', 'v.embedding')} AS sim_q
            FROM assigned q JOIN assigned v
              ON q.cell = v.cell AND q.vec_id <> v.vec_id
            WHERE q.vec_id < {IVF_N_QUERIES}
        )""",
        f"""cand AS MATERIALIZED (
            SELECT query_id, vec_id, emb, sim_q FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY sim_q DESC, vec_id ASC) AS rn
                FROM cand0
            ) WHERE rn <= {_MMR_N}
        )""",
        f"""pair AS MATERIALIZED (
            SELECT a.query_id, a.vec_id AS pa, b.vec_id AS pb,
                   {_cos_duck('a.emb', 'b.emb')} AS sim_ab
            FROM cand a JOIN cand b
              ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
        )""",
        f"""sel1 AS (
            SELECT query_id, vec_id, sim_q,
                   ROUND({lam} * sim_q, 6) AS mmr, 1 AS sel_rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY sim_q DESC, vec_id ASC) AS rn
                FROM cand
            ) WHERE rn = 1
        )""",
        "selall1 AS (SELECT * FROM sel1)",
    ]
    for k in range(2, _MMR_K + 1):
        parts.append(
            f"""ms{k} AS (
                SELECT p.query_id, p.pa AS vec_id, MAX(p.sim_ab) AS max_sel
                FROM pair p JOIN selall{k - 1} s
                  ON p.query_id = s.query_id AND p.pb = s.vec_id
                GROUP BY p.query_id, p.pa
            )"""
        )
        parts.append(
            f"""cand{k} AS (
                SELECT c.query_id, c.vec_id, c.sim_q, m.max_sel
                FROM cand c JOIN ms{k} m
                  ON c.query_id = m.query_id AND c.vec_id = m.vec_id
                WHERE NOT EXISTS (
                    SELECT 1 FROM selall{k - 1} s
                    WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id)
            )"""
        )
        parts.append(
            f"""sel{k} AS (
                SELECT query_id, vec_id, sim_q,
                       ROUND({lam} * sim_q - {om} * max_sel, 6) AS mmr,
                       {k} AS sel_rank
                FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY query_id
                        ORDER BY {lam} * sim_q - {om} * max_sel DESC,
                                 vec_id ASC) AS rn
                    FROM cand{k}
                ) WHERE rn = 1
            )"""
        )
        parts.append(
            f"selall{k} AS (SELECT * FROM selall{k - 1}"
            f" UNION ALL SELECT * FROM sel{k})"
        )
    return (
        f"WITH {ivf_assigned_cte()},\n"
        + ",\n".join(parts)
        + f"""
        SELECT query_id, vec_id, ROUND(sim_q, 6) AS sim_q, mmr,
               CAST(sel_rank AS BIGINT) AS sel_rank
        FROM selall{_MMR_K}
    """
    )


def _mmr_tables(spark: SparkSession, sf_dir: str):
    """Session-cached (cand, pair) tables for MMR: bounded at
    queries x N and queries x N^2 rows respectively. Without caching,
    the k unrolled greedy stages re-derive the candidate window and the
    in-cell join combinatorially (each stage references all prior
    stages' lineage) — with it, each stage is a shallow join over two
    tiny cached tables."""
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES, ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import _cached, dot_col

    def build_cand() -> DataFrame:
        assigned = ivf_assigned_table(spark, sf_dir)
        q = assigned.filter(F.col("vec_id") < IVF_N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("cell").alias("q_cell"),
        )
        cos_qv = dot_col(F.col("q_emb"), F.col("embedding")) / (
            F.col("q_nrm") * F.col("nrm")
        )
        w_simq = Window.partitionBy("query_id").orderBy(
            F.col("sim_q").desc(), F.col("vec_id").asc()
        )
        res = (
            assigned.join(
                F.broadcast(q),
                (F.col("cell") == F.col("q_cell"))
                & (F.col("vec_id") != F.col("query_id")),
            )
            .select("query_id", "vec_id", "embedding", "nrm", cos_qv.alias("sim_q"))
            .withColumn("rn", F.row_number().over(w_simq))
            .where(F.col("rn") <= _MMR_N)
            .drop("rn")
            .persist()
        )
        res.count()
        return res

    cand = _cached("mmr_cand", spark, sf_dir, build_cand)

    def build_pair() -> DataFrame:
        from weather_flink_spark.plans.llm_pipeline import dot_col as _dot

        a, b = cand.alias("a"), cand.alias("b")
        sim_ab = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        res = (
            a.join(
                b,
                (F.col("a.query_id") == F.col("b.query_id"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .select(
                F.col("a.query_id").alias("query_id"),
                F.col("a.vec_id").alias("pa"),
                F.col("b.vec_id").alias("pb"),
                sim_ab.alias("sim_ab"),
            )
            .persist()
        )
        res.count()
        return res

    pair = _cached("mmr_pair", spark, sf_dir, build_pair)
    return cand, pair



@register(
    "q_sim_mmr_diversify",
    oracle=_mmr_oracle(),
    doc=(
        "Maximal Marginal Relevance re-ranking (Carbonell & Goldstein "
        "1998): greedily select k=4 of each query's top-8 in-cell "
        "candidates, each step maximizing lambda*sim(q,d) - "
        "(1-lambda)*max_sim(d, selected) — relevant but mutually "
        "diverse results. The greedy argmax steps are UNROLLED into "
        "k-1 deterministic join/groupBy/window stages (no driver loop "
        "over data, no UDF), so this classically iterative operator is "
        "fully oracle-checked on both engines. Scale: the candidate "
        "pool is bounded per query (top-N window) and the pairwise "
        "table is N^2 per query; every window partitions by query_id."
    ),
    tags=("similarity", "ann", "ivf", "llm-pipeline"),
)
def q_sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    lam, om = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 6)
    cand, pair = _mmr_tables(spark, sf_dir)
    # The greedy argmax runs as ONE cogrouped applyInPandas over
    # query_id — the same distributed-sequential pattern as LTTB, Holt
    # and Croston: each group holds a BOUNDED pool (<=N candidates,
    # <=N^2 pairs, corpus-independent), the per-group selection is a
    # k-step fold over Arrow-delivered doubles, and parallelism is the
    # query count. This replaced the round-5 k-unrolled window-stage
    # chain (hash-identical results, ~2.2-2.9 s of per-stage
    # shuffle/checkpoint scheduling at sf0.1 for 20 output rows); the
    # running max_sel fold (max_sel_k = max(max_sel_{k-1}, sim to the
    # newest pick)) is exact in IEEE doubles, so every mmr value,
    # comparison and (mmr DESC, vec_id ASC) tie-break reproduces the
    # oracle's unrolled CTE stages bit-for-bit. No driver loop; no
    # per-row Python — one Arrow batch per query group.
    import numpy as np
    import pandas as pd

    k_sel, lam_f, om_f = _MMR_K, float(lam), float(om)

    def greedy(cand_pdf: pd.DataFrame, pair_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(
                {"query_id": [], "vec_id": [], "sim_q": [], "mmr_raw": [], "sel_rank": []}
            )
        qid = int(cand_pdf["query_id"].iloc[0])
        # the greedy below relies on _mmr_tables delivering the COMPLETE
        # n*(n-1) pair matrix — a silently-missing pair would hit the
        # dict default and bias selection instead of failing; if the
        # pair build ever gains a filter/cap, fail loudly here
        n_cand = len(cand_pdf)
        if len(pair_pdf) != n_cand * (n_cand - 1):
            raise ValueError(
                f"MMR pair matrix incomplete for query {qid}: "
                f"{len(pair_pdf)} pairs for {n_cand} candidates "
                f"(expected {n_cand * (n_cand - 1)})"
            )
        vid = cand_pdf["vec_id"].to_numpy()
        sim_q = cand_pdf["sim_q"].to_numpy()
        # pairwise sims as a lookup keyed by (pa index, pb vec_id)
        sim_ab = {
            (int(a), int(b)): s
            for a, b, s in zip(pair_pdf["pa"], pair_pdf["pb"], pair_pdf["sim_ab"])
        }
        # pick 1: max sim_q, vec_id ASC tie-break
        order = np.lexsort((vid, -sim_q))
        first = order[0]
        out = [(qid, int(vid[first]), float(sim_q[first]), lam_f * float(sim_q[first]), 1)]
        alive = np.ones(len(vid), dtype=bool)
        alive[first] = False
        max_sel = np.array(
            [sim_ab.get((int(v), int(vid[first])), -2.0) for v in vid], dtype=np.float64
        )
        for step in range(2, min(k_sel, len(vid)) + 1):
            mmr = lam_f * sim_q - om_f * max_sel
            mmr[~alive] = -np.inf
            cand_order = np.lexsort((vid, -mmr))
            pick = cand_order[0]
            out.append((qid, int(vid[pick]), float(sim_q[pick]), float(mmr[pick]), step))
            alive[pick] = False
            sim_new = np.array(
                [sim_ab.get((int(v), int(vid[pick])), -2.0) for v in vid],
                dtype=np.float64,
            )
            max_sel = np.maximum(max_sel, sim_new)
        return pd.DataFrame(
            out, columns=["query_id", "vec_id", "sim_q", "mmr_raw", "sel_rank"]
        )

    sel_all = (
        cand.select("query_id", "vec_id", "sim_q")
        .groupBy("query_id")
        .cogroup(pair.groupBy("query_id"))
        .applyInPandas(
            greedy,
            schema="query_id bigint, vec_id bigint, sim_q double, "
            "mmr_raw double, sel_rank bigint",
        )
    )
    return sel_all.select(
        "query_id",
        "vec_id",
        F.round(F.col("sim_q"), 6).alias("sim_q"),
        F.round(F.col("mmr_raw"), 6).alias("mmr"),
        "sel_rank",
    )
