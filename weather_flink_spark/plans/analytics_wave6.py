"""Sixth wave: pipeline-infrastructure operators (SURVEY.md §2-C).

- ``q_mv_incremental_agg`` — incremental materialized-view maintenance:
  a per-customer revenue MV built from *partial aggregates* of the
  historical slice merged with the fresh-delta slice, proven equal to
  a full recompute (the oracle computes the direct full aggregation).
  This is the Delta-/Iceberg-style MV refresh shape: at 100 TB you
  never re-scan history — you aggregate the delta and merge partials
  keyed on the MV key.
- ``q_text_bpe_pairs`` — BPE merge-candidate mining: corpus-frequency-
  weighted adjacent-symbol-pair counts (the inner loop of byte-pair-
  encoding training), computed over the *distinct-word* table so the
  pair explosion is |vocab|·word_len, not |corpus|·word_len.
- ``q_sim_ann_recall`` — ANN quality evaluation: recall@k of the IVF
  (nprobe=1) searcher against exact brute-force cosine top-k, per
  query and overall — the accuracy harness that must accompany any
  approximate index before it replaces the exact path.
- ``q_dedup_paragraph`` — sub-document (paragraph-granularity)
  cross-corpus dedup by content-hashed fixed-width word chunks
  (the C4/CCNet boilerplate-removal unit).
- ``q_text_ccnet_buckets`` — CCNet head/middle/tail corpus partition
  by bigram-LM perplexity terciles per language; the oracle is
  COMPOSED from q_text_perplexity_bigram's oracle text so the two
  can never drift apart.
- ``q_dedup_semantic_ivf`` — SemDeDup-shaped semantic dedup: pairwise
  cosine only within IVF cells, smallest-id representative kept.

Parity discipline as everywhere (registry.py): exact DECIMAL money
sums, deterministic tie-breaks, identical aliases both engines. The
reference has no batch surface at all (empty plan body,
WeatherProcessingJobPlan.java:9-11); these are §2-C north-star entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.plans.llm_pipeline import dot_col

# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance
# ---------------------------------------------------------------------------

_MV_CUTOFF = "TIMESTAMP '2000-01-01 00:00:00'"


@register(
    "q_mv_incremental_agg",
    oracle=f"""
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
    """,
    doc=(
        "Incremental MV maintenance: the per-customer revenue view is "
        "NOT recomputed from scratch — the historical slice (< cutoff) "
        "and the delta slice (>= cutoff) are aggregated independently "
        "and their *partials* merged with a full outer join "
        "(count-sum-max are all mergeable aggregates). The oracle is the "
        "direct full recompute, so the hash match proves "
        "merge(partial_hist, partial_delta) == recompute(full) — the "
        "refresh contract a 100 TB MV pipeline depends on (aggregate "
        "only the delta, merge keyed on the MV key, never re-scan "
        "history). Both partial aggregations keep DECIMAL sums so the "
        "merged double is bit-identical to the one-shot aggregation."
    ),
    tags=("mv", "incremental", "agg"),
)
def q_mv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.expr(_MV_CUTOFF)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("p_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("p_rev"),
            F.max("o_orderdate").alias("p_last"),
        )

    hist = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    merged = hist.alias("h").join(
        delta.alias("d"), on="o_custkey", how="full_outer"
    )
    return merged.select(
        "o_custkey",
        (F.coalesce(F.col("h.p_n"), F.lit(0)) + F.coalesce(F.col("d.p_n"), F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce(F.col("h.p_rev"), F.lit(0).cast("decimal(18,6)"))
            + F.coalesce(F.col("d.p_rev"), F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("revenue"),
        F.greatest(F.col("h.p_last"), F.col("d.p_last")).alias("last_order"),
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate mining
# ---------------------------------------------------------------------------

_BPE_TOP = 30


@register(
    "q_text_bpe_pairs",
    oracle=f"""
        WITH words AS (
            SELECT w, COUNT(*) AS freq
            FROM (
                SELECT UNNEST(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS w
                FROM documents
            )
            GROUP BY w
        ),
        pairs AS (
            SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
            FROM (
                SELECT freq,
                       UNNEST(list_transform(
                           range(1, length(w)),
                           i -> substring(w, CAST(i AS INT), 2))) AS pair
                FROM words
                WHERE length(w) >= 2
            )
            GROUP BY pair
        )
        SELECT pair, pair_count, rk FROM (
            SELECT pair, pair_count,
                   ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair ASC) AS rk
            FROM pairs
        ) WHERE rk <= {_BPE_TOP}
    """,
    doc=(
        "BPE training inner loop: corpus-frequency-weighted adjacent "
        "character-pair counts, top candidates ranked for the next merge. "
        "The pair explosion runs over the DISTINCT-word table with its "
        "corpus frequency attached — |vocab|·len work instead of "
        "|corpus|·len (the same rollup-first trick real BPE trainers "
        "use). Final rank is the two-pass range-partitioned global "
        "row-number (operators/global_order.py), never a single-task "
        "window."
    ),
    tags=("text", "tokenizer"),
)
def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        words.where(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )
    # global rank without a partitionless window: the two-pass
    # range-partitioned pattern (operators/global_order.py) — even though
    # the pair alphabet is bounded, the registry-wide plan net holds every
    # query to the 100 TB-safe shape
    from weather_flink_spark.operators.global_order import attach_global_row_number

    ranked = attach_global_row_number(
        pairs, [F.col("pair_count").desc(), F.col("pair").asc()], out_col="rk"
    )
    return ranked.where(F.col("rk") <= _BPE_TOP).select("pair", "pair_count", "rk")


# ---------------------------------------------------------------------------
# ANN recall evaluation (IVF vs exact brute force)
# ---------------------------------------------------------------------------

from weather_flink_spark.plans.llm_extra import (  # noqa: E402
    IVF_N_QUERIES,
    IVF_TOP_K,
    _cos_duck,
    ivf_assigned_cte,
)


@register(
    "q_sim_ann_recall",
    oracle=f"""
        WITH {ivf_assigned_cte()},
        ivf AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC
                       ) AS k_rank
                FROM assigned q JOIN assigned v
                  ON q.cell = v.cell AND q.vec_id <> v.vec_id
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE k_rank <= {IVF_TOP_K}
        ),
        exact AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC
                       ) AS k_rank
                FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE k_rank <= {IVF_TOP_K}
        )
        SELECT e.query_id,
               COUNT(*) AS k,
               COUNT(i.vec_id) AS n_hit,
               CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
        FROM exact e
        LEFT JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
        GROUP BY e.query_id
    """,
    doc=(
        "ANN accuracy harness: recall@k of the IVF nprobe=1 searcher "
        "against exact brute-force cosine top-k, per query. The exact "
        "side broadcasts the bounded query set against the corpus (the "
        "same shape as q_sim_cosine_topk); the approximate side reuses "
        "the IVF cell-blocked search; the comparison is a join on "
        "(query, neighbor). This is the gate that must pass before an "
        "approximate index replaces the exact path in production — "
        "deterministic (fixed centroid subset, tie-broken ranks) and "
        "therefore oracle-checkable end to end."
    ),
    tags=("similarity", "ann", "evaluation"),
)
def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import exact_topk_table, q_sim_ann_ivf

    ivf = q_sim_ann_ivf(spark, sf_dir).select("query_id", "vec_id")
    # shared session-cached ground truth — one build serves all three
    # recall gates (see exact_topk_table)
    exact = exact_topk_table(spark, sf_dir)
    hit = exact.join(
        ivf.withColumnRenamed("vec_id", "ivf_vec").withColumnRenamed(
            "query_id", "ivf_query"
        ),
        (F.col("query_id") == F.col("ivf_query")) & (F.col("vec_id") == F.col("ivf_vec")),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.count("ivf_vec").alias("n_hit"),
        (F.count("ivf_vec").cast("double") / F.count("*")).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Paragraph-granularity cross-document dedup (C4/CCNet-style)
# ---------------------------------------------------------------------------

_PARA_W = 8  # words per chunk ("paragraph" unit on the synthetic corpus)


@register(
    "q_dedup_paragraph",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   UNNEST(list_transform(
                       range(0, len(tok) // {_PARA_W}),
                       k -> md5(array_to_string(
                           list_slice(tok, k * {_PARA_W} + 1, (k + 1) * {_PARA_W}),
                           ' ')))) AS ch
            FROM tok
        ),
        shared AS (
            SELECT ch FROM chunks GROUP BY ch
            HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT c.doc_id,
               COUNT(*) AS n_chunks,
               COUNT(s.ch) AS n_shared,
               CAST(COUNT(s.ch) AS DOUBLE) / COUNT(*) AS shared_frac
        FROM chunks c LEFT JOIN shared s ON s.ch = c.ch
        GROUP BY c.doc_id
        HAVING COUNT(s.ch) > 0
    """,
    doc=(
        "Sub-document (paragraph-granularity) cross-corpus dedup, the "
        "C4/CCNet removal unit: fixed-width full word-chunks are content- "
        "hashed; a chunk whose hash occurs in ≥2 distinct documents is "
        "boilerplate/duplication, and each affected document reports its "
        "shared-chunk fraction. Everything moves by chunk digest — two "
        "partial-aggregated groupBys (per-hash doc count, per-doc rollup) "
        "plus one digest-keyed join; document text never shuffles. At "
        "100 TB the shared set is far smaller than the chunk stream, so "
        "the probe side broadcasts or map-side-joins."
    ),
    tags=("dedup", "text", "paragraph"),
)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # filter BEFORE the explode (matches tools/scaling_probe.py): short
    # docs never generate a descending sequence(0, -1), and the plan
    # does not rely on Spark resolving a filter over a dropped column
    tok = d.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok")
    ).where(F.expr(f"size(tok) >= {_PARA_W}"))
    w = _PARA_W
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(size(tok) / {w} as int) - 1),"
                f" k -> md5(array_join(slice(tok, k * {w} + 1, {w}), ' ')))"
            )
        ).alias("ch"),
    )
    shared = (
        chunks.groupBy("ch")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("ch", F.lit(1).alias("is_shared"))
    )
    # no forced broadcast: the shared set scales with duplicate
    # STRUCTURE, not corpus size — usually tiny (AQE broadcasts it at
    # runtime), but a pathologically duplicated corpus must still plan,
    # so the digest-keyed shuffle join stays available
    return (
        chunks.join(shared, "ch", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count("is_shared").alias("n_shared"),
            (F.count("is_shared").cast("double") / F.count("*")).alias("shared_frac"),
        )
        .where(F.col("n_shared") > 0)
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail per language)
# ---------------------------------------------------------------------------


@register(
    "q_text_ccnet_buckets",
    # wrap the oracle of q_text_perplexity_bigram: identical scoring text,
    # then per-language deterministic terciles over (avg_nll, doc_id)
    oracle=None,  # filled in below after import (composed SQL)
    doc=(
        "CCNet-style corpus partitioning: documents are scored by the "
        "corpus bigram-LM average NLL (exactly q_text_perplexity_bigram's "
        "pipeline) and split per-language into head/middle/tail terciles "
        "— the buckets CCNet uses to keep fluent text and downweight "
        "gibberish. The tercile is NTILE(3) over (avg_nll, doc_id) "
        "partitioned by language: deterministic tie-break, per-stratum "
        "window (never global), and the scored table is tiny relative to "
        "the corpus (one row per doc)."
    ),
    tags=("text", "quality", "lm"),
)
def q_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import q_text_perplexity_bigram

    scored = q_text_perplexity_bigram(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("avg_nll").asc(), F.col("doc_id").asc())
    bucket = F.when(F.col("tercile") == 1, "head").when(
        F.col("tercile") == 2, "middle"
    ).otherwise("tail")
    return (
        scored.join(d, "doc_id")
        .withColumn("tercile", F.ntile(3).over(w))
        .select("doc_id", "lang", "avg_nll", "tercile", bucket.alias("bucket"))
    )


def _install_ccnet_oracle() -> None:
    """Compose the CCNet oracle from q_text_perplexity_bigram's oracle
    text so the two can never drift apart."""
    import dataclasses

    from weather_flink_spark.plans.registry import _REGISTRY

    base = _REGISTRY["q_text_perplexity_bigram"].oracle
    spec = _REGISTRY["q_text_ccnet_buckets"]
    composed = f"""
        WITH scored AS ({base})
        SELECT s.doc_id, d.lang, s.avg_nll, t.tercile,
               CASE t.tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored s
        JOIN documents d ON d.doc_id = s.doc_id
        JOIN (
            SELECT s2.doc_id,
                   NTILE(3) OVER (PARTITION BY d2.lang
                                  ORDER BY s2.avg_nll ASC, s2.doc_id ASC)
                       AS tercile
            FROM scored s2 JOIN documents d2 ON d2.doc_id = s2.doc_id
        ) t ON t.doc_id = s.doc_id
    """
    _REGISTRY["q_text_ccnet_buckets"] = dataclasses.replace(spec, oracle=composed)


_install_ccnet_oracle()


# ---------------------------------------------------------------------------
# SemDeDup-style within-cell semantic dedup
# ---------------------------------------------------------------------------

SEMANTIC_DUP_THRESHOLD = 0.30  # ≈ p99 of within-cell cosine on this corpus;
# real embedding spaces use ~0.95+ — the τ is data-scaled, the plan is not.


@register(
    "q_dedup_semantic_ivf",
    oracle=f"""
        WITH {ivf_assigned_cte()},
        pairs AS (
            SELECT a.cell, a.vec_id AS keep_cand, b.vec_id AS drop_id,
                   {_cos_duck('a.embedding', 'b.embedding')} AS cosine
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE {_cos_duck('a.embedding', 'b.embedding')}
                  >= {SEMANTIC_DUP_THRESHOLD}
        )
        SELECT cell, keep_id, drop_id, cosine FROM (
            SELECT cell, keep_cand AS keep_id, drop_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY drop_id
                                      ORDER BY keep_cand ASC) AS rn
            FROM pairs
        ) WHERE rn = 1
    """,
    doc=(
        "SemDeDup-shaped semantic dedup: vectors are coarse-quantized "
        "into the TRAINED k-means IVF cells (fixed k, session-cached "
        "model), pairwise cosine runs ONLY within a cell — O(n·cell_"
        "size), never the n² cross-corpus product — and each above-"
        "threshold vector is dropped in favor of its smallest-id "
        "duplicate (deterministic keep rule). Because fixed k means "
        "cell size grows with the corpus, cells beyond "
        "SEMDEDUP_CELL_BOUND are refined into cosine-aware sub-cells "
        "(operators/semdedup.bounded_cells) so the pair phase stays "
        "bound²-limited per cell; refined ids equal the coarse ids "
        "whenever a cell is within bound, so the sf0.01 oracle is "
        "unaffected while the split is live at sf0.1+. The cell is the "
        "shuffle key, so every comparison is partition-local. r11 "
        "(three-round wall-clock offender, 2.7→6.6 s): the pair phase "
        "is two-stage — a per-cell Arrow/numpy GEMM prefilter (fused "
        "BLAS over the bound²-capped cell, margin 1e-9 below τ: a "
        "64-term float64 dot's summation-order error is < 1.5e-14, so "
        "no true pair can be lost and the candidate set is "
        "BLAS-independent) followed by the SAME sequential-fold exact "
        "cosine re-deciding only the ~p99 survivors — output "
        "bit-identical to the single-stage fold, oracle unchanged, "
        "~5x wall-clock. Threshold is data-scaled (see constant); the "
        "plan shape is exactly production SemDeDup: cluster, compare "
        "within cluster, keep one representative."
    ),
    tags=("dedup", "embedding", "semantic", "pandas-udf"),
)
def q_dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.operators.semdedup import bounded_cells
    from weather_flink_spark.plans.llm_extra import ivf_assigned_table

    # session-cached assignment (vec_id, embedding, nrm, cell) — shared
    # with q_sim_ann_ivf / q_sim_ann_recall; one persist, many consumers.
    # bounded_cells caps the quadratic pair space per cell (no-op at the
    # sf0.01 oracle gate where every cell is within bound).
    coarse = ivf_assigned_table(spark, sf_dir)
    # snapshot the refined assignment (r12): the bounded_cells subtree
    # (sizes join + two windows + union) was re-planned per downstream
    # reference — 89 Exchange / 27 BNLJ for a 3-shuffle computation.
    # The refinement is deterministic; only its plan count changes.
    from weather_flink_spark.operators.snapshot import snapshot

    assigned = bounded_cells(coarse).transform(snapshot(eager=False))
    return semantic_dedup_pairs(assigned, coarse)


def semantic_dedup_pairs(assigned: DataFrame, coarse: DataFrame) -> DataFrame:
    """The two-stage within-cell pair phase (exposed so tests can force
    a low refinement bound): GEMM prefilter over ``assigned`` (refined
    cells), exact-fold verify against ``coarse`` (vec_id → embedding)."""
    import pandas as _pd

    # Stage 1 — GEMM prefilter, partition-local per refined cell: one
    # fused float64 matmul over the bound²-capped cell replaces ~cell²
    # interpreted zip_with/aggregate lambda folds (higher-order exprs
    # get no codegen — this was the measured 5-6 s). The 1e-9 margin
    # dominates any summation-order divergence between BLAS and the
    # sequential fold (64 terms x 2.2e-16 ulp ~ 1.5e-14), so every
    # true >= τ pair survives regardless of BLAS build/threading.
    margin = SEMANTIC_DUP_THRESHOLD - 1e-9

    def cell_pairs(pdf: _pd.DataFrame) -> _pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        g = (x @ x.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        m = g[iu, ju] >= margin
        return _pd.DataFrame(
            {
                "cell": np.full(int(m.sum()), int(pdf["cell"].iloc[0])),
                "keep_cand": ids[iu[m]],
                "drop_id": ids[ju[m]],
            }
        )

    cand = assigned.groupBy("cell").applyInPandas(
        cell_pairs, "cell bigint, keep_cand bigint, drop_id bigint"
    )

    # Stage 2 — the SAME sequential-fold exact cosine re-decides the
    # small survivor set (reads embeddings from the coarse cache on
    # vec_id; candidate count is ~p99 of within-cell pairs, never the
    # pair space), so the emitted cosine and the >= τ decision are
    # bit-identical to the single-stage fold the oracle replays.
    ka = coarse.select(
        F.col("vec_id").alias("keep_cand"),
        F.col("embedding").alias("e_a"),
        F.col("nrm").alias("n_a"),
    )
    kb = coarse.select(
        F.col("vec_id").alias("drop_id"),
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("n_b"),
    )
    pairs = (
        cand.join(ka, "keep_cand")
        .join(kb, "drop_id")
        .select(
            "cell",
            "keep_cand",
            "drop_id",
            (
                dot_col(F.col("e_a"), F.col("e_b"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEMANTIC_DUP_THRESHOLD)
    )
    w_keep = Window.partitionBy("drop_id").orderBy(F.col("keep_cand").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("keep_cand").alias("keep_id"), "drop_id", "cosine")
    )
