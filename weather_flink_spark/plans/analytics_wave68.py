"""Wave-68 operator (round 9): maximum-inner-product search (MIPS) —
the fourth similarity SEMANTICS in the engine (cosine, Hamming,
L2-over-quantized already exist; recommendation scoring needs raw
dot products, where longer vectors legitimately rank higher).

``q_sim_mips_topk``: exact dot-product top-k for the 5 gate queries
over the embedding corpus — the brute-force MIPS baseline, the same
broadcast-query scan shape as q_sim_cosine_topk.

The scale path is the norm-AUGMENTATION reduction (Bachrach et al.
2014; Shrivastava & Li 2014): with M = max corpus norm, mapping
corpus vectors to [x, sqrt(M^2 - |x|^2)] and queries to [q, 0] makes
augmented-COSINE order identical to dot-product order, so every
cosine-ANN tier in this engine (IVF, flat graph, HNSW, binary) serves
MIPS unchanged. That reduction is proven BEHAVIORALLY in the tests:
the augmented corpus is built for real, exact cosine top-k runs over
it with the engine's own dot/norm kernels, and the result set must
equal this entry's dot top-k row-for-row.

Parity: dot products use the shared sequential-fold expansion
(llm_pipeline.dot_col == llm_extra._DOT_AB_DUCK) that every cosine
entry already hash-matches on.

Reference parity note: the reference implements no similarity search
(empty plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register


def _mips_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import (
        _DOT_AB_DUCK,
        IVF_N_QUERIES,
        IVF_TOP_K,
    )

    dot = _DOT_AB_DUCK.format(a="q.embedding", b="v.embedding")
    return f"""
        SELECT query_id, vec_id, dot, CAST(k_rank AS BIGINT) AS k_rank
        FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   {dot} AS dot,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {dot} DESC, v.vec_id ASC) AS k_rank
            FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
            WHERE q.vec_id < {IVF_N_QUERIES}
        ) WHERE k_rank <= {IVF_TOP_K}
    """


@register(
    "q_sim_mips_topk",
    oracle=_mips_oracle(),
    doc=(
        "Maximum-inner-product top-k (r9) — the fourth similarity "
        "semantics (recommendation scoring: longer vectors "
        "legitimately rank higher, unlike cosine): exact dot-product "
        "top-5 for the gate queries, one broadcast-query scan + "
        "per-query top-k windows (the q_sim_cosine_topk shape). The "
        "100 TB path is the Bachrach-2014 norm-augmentation reduction "
        "(corpus -> [x, sqrt(M^2-|x|^2)], query -> [q, 0]) under "
        "which every cosine-ANN tier here serves MIPS unchanged — "
        "proven behaviorally in tests: exact cosine top-k over the "
        "actually-augmented corpus equals this dot top-k row-for-row."
    ),
    tags=("similarity", "mips", "ann"),
)
def q_sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        ivf_assigned_table,
    )
    from weather_flink_spark.plans.llm_pipeline import dot_col

    a = ivf_assigned_table(spark, sf_dir)
    q = a.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    dot = dot_col(F.col("q_emb"), F.col("embedding"))
    w_dot = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    return (
        a.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot.alias("dot"))
        .withColumn("k_rank", F.row_number().over(w_dot))
        .filter(F.col("k_rank") <= IVF_TOP_K)
        .select(
            "query_id",
            "vec_id",
            "dot",
            F.col("k_rank").cast("bigint").alias("k_rank"),
        )
    )
