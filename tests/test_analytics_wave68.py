"""Wave-68: MIPS top-k + the norm-augmentation reduction proof."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_mips_differs_from_cosine_and_is_exact(spark):
    """MIPS is a genuinely different semantics on this corpus: the
    dot top-k and cosine top-k disagree for at least one query (else
    the entry would be redundant), and every returned dot is the true
    maximum ordering (spot-verified vs a numpy replay)."""
    import numpy as np
    import pandas as pd

    rows = all_specs()["q_sim_mips_topk"].fn(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    M = np.stack(emb.embedding.to_numpy())
    ids = emb.vec_id.to_numpy()
    for qid, hits in by_q.items():
        hits.sort(key=lambda r: r.k_rank)
        dots = M @ M[list(ids).index(qid)]
        order = sorted(
            [(float(d), int(i)) for d, i in zip(dots, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert [h.vec_id for h in hits] == [i for _, i in order]
        for h, (d, _) in zip(hits, order):
            # numpy may fold in float32 (storage dtype); the engine
            # folds element-casts to double — compare loosely
            assert abs(h.dot - d) < 1e-5

    cos = all_specs()["q_sim_cosine_topk"].fn(spark, SF).collect()
    cos_sets = {}
    for r in cos:
        cos_sets.setdefault(r.query_id, set()).add(r.vec_id)
    mips_sets = {q: {h.vec_id for h in hs} for q, hs in by_q.items()}
    assert any(mips_sets[q] != cos_sets.get(q, set()) for q in mips_sets)


def test_norm_augmentation_reduces_mips_to_cosine(spark):
    """The Bachrach-2014 reduction, run FOR REAL: augment every corpus
    vector with sqrt(M^2 - |x|^2) and every query with 0, take exact
    COSINE top-k over the augmented vectors with the engine's own
    kernels — the result must equal the MIPS entry row-for-row."""
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        ivf_assigned_table,
    )
    from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col

    a = ivf_assigned_table(spark, SF)
    m2 = a.agg(
        F.max(dot_col(F.col("embedding"), F.col("embedding"))).alias("m2")
    )
    aug = a.crossJoin(F.broadcast(m2)).select(
        "vec_id",
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(
                F.sqrt(
                    F.col("m2") - dot_col(F.col("embedding"), F.col("embedding"))
                )
            ),
        ).alias("aug_emb"),
    )
    q = a.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(F.lit(0.0)),
        ).alias("q_aug"),
    )
    cos = dot_col(F.col("q_aug"), F.col("aug_emb")) / (
        norm_col(F.col("q_aug")) * norm_col(F.col("aug_emb"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    aug_top = (
        aug.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("k", F.row_number().over(w))
        .filter(F.col("k") <= IVF_TOP_K)
    )
    got = {
        (r.query_id, r.k): r.vec_id for r in aug_top.collect()
    }
    mips = all_specs()["q_sim_mips_topk"].fn(spark, SF).collect()
    want = {(r.query_id, r.k_rank): r.vec_id for r in mips}
    assert got == want
