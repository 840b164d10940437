"""Wave-10 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

import numpy as np

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_cuped_matches_numpy(spark):
    """theta and the adjusted variance must agree with a direct numpy
    computation over the same per-user means (to quantization)."""
    from weather_flink_spark.plans.analytics_wave10 import _CUPED_CUT

    e = load(spark, SF, "events").select("user_id", "ts", "value").collect()
    import collections

    pre = collections.defaultdict(list)
    post = collections.defaultdict(list)
    cut = np.datetime64(_CUPED_CUT)
    for r in e:
        (pre if np.datetime64(r.ts) < cut else post)[r.user_id].append(r.value)
    users = sorted(set(pre) & set(post))
    p = np.array([round(float(np.sum(pre[u]) / len(pre[u])), 6) for u in users])
    y = np.array([round(float(np.sum(post[u]) / len(post[u])), 6) for u in users])
    cov = float(np.cov(p, y, ddof=1)[0, 1])
    var_p = float(np.var(p, ddof=1))
    var_y = float(np.var(y, ddof=1))
    row = all_specs()["q_stats_cuped"].fn(spark, SF).collect()[0]
    assert row.n_users == len(users)
    assert abs(row.theta - cov / var_p) < 1e-4
    assert abs(row.var_post - var_y) < 1e-4
    assert abs(row.var_adjusted - (var_y - cov * cov / var_p)) < 1e-3
    assert 0.0 < row.var_reduction < 1.0


def test_centroid_drift_bounds(spark):
    rows = all_specs()["q_emb_centroid_drift"].fn(spark, SF).collect()
    assert rows
    assert sum(r.n_vecs for r in rows) == load(spark, SF, "embeddings").count()
    for r in rows:
        assert -1.0 <= r.cos_to_global <= 1.0
        assert r.l2sq_to_global >= 0.0


@pytest.mark.slow
def test_keep_list_one_keeper_per_cluster(spark):
    rows = all_specs()["q_dedup_keep_list"].fn(spark, SF).collect()
    assert rows
    import collections

    by_cluster = collections.defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)
    for cid, rs in by_cluster.items():
        keepers = [r for r in rs if r.keep]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        k = keepers[0]
        # the keeper is the longest doc (doc_id tie-break)
        for r in rs:
            assert (k.n_chars, -k.doc_id) >= (r.n_chars, -r.doc_id)
        assert len(rs) == rs[0].cluster_size and len(rs) >= 2


def test_keep_list_consistent_with_clusters(spark):
    """keep-list cluster ids must be exactly q_dedup_clusters' canonical
    ids restricted to multi-doc clusters."""
    kl = all_specs()["q_dedup_keep_list"].fn(spark, SF)
    cl = all_specs()["q_dedup_clusters"].fn(spark, SF)
    multi = (
        cl.groupBy("canonical_id")
        .agg(F.count("*").alias("n"))
        .where("n >= 2")
        .select(F.col("canonical_id").alias("cluster_id"))
    )
    a = {r.cluster_id for r in kl.select("cluster_id").distinct().collect()}
    b = {r.cluster_id for r in multi.collect()}
    assert a == b


@pytest.mark.slow
def test_mmr_diversifies_vs_topk(spark):
    """MMR's selection must (a) start with the top-1 by similarity,
    (b) never select near-identical pairs when a diverse alternative
    exists, and (c) produce contiguous ranks 1..k' per query."""
    from weather_flink_spark.plans.analytics_wave10 import _MMR_K, _mmr_tables

    rows = all_specs()["q_sim_mmr_diversify"].fn(spark, SF).collect()
    assert rows
    cand, pair = _mmr_tables(spark, SF)
    top1 = {
        r.query_id: r.vec_id
        for r in cand.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "query_id"
                ).orderBy(F.col("sim_q").desc(), F.col("vec_id").asc())
            ),
        )
        .where("rn = 1")
        .collect()
    }
    import collections

    by_q = collections.defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.sel_rank)
        assert [r.sel_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _MMR_K
        assert rs[0].vec_id == top1[qid]
        # scores are non-increasing in rank order for ranks >= 2
        for i in range(2, len(rs) - 1):
            assert rs[i].mmr >= rs[i + 1].mmr - 1e-9
