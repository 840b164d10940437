"""Wave-27 semantics beyond the oracle hash: DSIR weights, classical
decomposition, LPA communities, k-core cascade, JL projection,
Kruskal-Wallis, l-diversity."""

from __future__ import annotations
import pytest

import math

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans import analytics_wave27 as w27
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_weights_cover_every_multitoken_doc(spark):
    res = all_specs()["q_text_dsir_weights"].fn(spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas()
    multi = docs[docs.text.str.split().str.len() >= 2]
    assert set(res.doc_id) == set(multi.doc_id)
    # n_grams = tokens - 1
    toks = multi.set_index("doc_id").text.str.split().str.len().sort_index()
    got = res.set_index("doc_id").n_grams.sort_index()
    assert (got.values == toks.values - 1).all()


def test_dsir_target_docs_score_higher_on_average(spark):
    """The importance weight must actually discriminate: mean weight of
    target-language docs above the non-target mean (that is the whole
    point of DSIR)."""
    res = all_specs()["q_text_dsir_weights"].fn(spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas()[["doc_id", "lang"]]
    m = res.merge(docs, on="doc_id")
    # per-gram normalization so long docs don't dominate
    m["w_per_gram"] = m.log_weight / m.n_grams
    t = m[m.lang == w27._DSIR_TARGET_LANG].w_per_gram.mean()
    o = m[m.lang != w27._DSIR_TARGET_LANG].w_per_gram.mean()
    assert t > o


# ---------------------------------------------------------------------------
# classical decomposition
# ---------------------------------------------------------------------------


def test_decompose_has_24_hods_per_type_and_centered_means_zero(spark):
    res = all_specs()["q_events_decompose_classical"].fn(spark, SF).toPandas()
    by_type = res.groupby("event_type")
    for t, g in by_type:
        assert set(g.hod) == set(range(24)), t
        # centered indices sum to ~0 per type (rounding noise only)
        assert abs(g.seasonal_centered.sum()) < 24 * 1e-6 + 1e-9, t


def test_decompose_trend_removal_shrinks_variance(spark):
    """The detrended seasonal index magnitudes must be bounded by the
    raw hourly count scale — decomposition should not amplify."""
    res = all_specs()["q_events_decompose_classical"].fn(spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    hourly_mean = len(e) / 5 / (30 * 24)  # ~events per type-hour
    assert res.seasonal_raw.abs().max() < 50 * max(hourly_mean, 1.0)


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_lpa_partitions_all_nodes(spark):
    res = all_specs()["q_graph_label_propagation"].fn(spark, SF).toPandas()
    n_vec = load(spark, SF, "embeddings").count()
    assert res["size"].sum() == n_vec
    # communities must be labeled by real vec_ids
    assert res.community.min() >= 0
    # more than one community, fewer than one-per-node (it propagated)
    assert 1 < len(res) < n_vec


@pytest.mark.slow
def test_lpa_rounds_refine_not_explode(spark):
    """Community count must not increase from round 2 to round 3
    by more than the synchronous-LPA oscillation allowance — and the
    helper at rounds=_LPA_ROUNDS must equal the registered query."""
    l2 = w27._lpa_labels(spark, SF, 2).toPandas()
    l3 = w27._lpa_labels(spark, SF, w27._LPA_ROUNDS).toPandas()
    assert len(set(l3.label)) <= len(set(l2.label)) * 2
    reg = all_specs()["q_graph_label_propagation"].fn(spark, SF).toPandas()
    regrouped = (
        l3.groupby("label")
        .agg(size=("node", "count"), min_member=("node", "min"))
        .reset_index()
    )
    got = reg.sort_values("community").reset_index(drop=True)
    exp = regrouped.sort_values("label").reset_index(drop=True)
    assert (got.community.values == exp.label.values).all()
    assert (got["size"].values == exp["size"].values).all()


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def test_kcore_cascade_monotone_and_fixpoint(spark):
    res = (
        all_specs()["q_graph_kcore"].fn(spark, SF).toPandas().sort_values("round")
    )
    assert list(res["round"]) == list(range(w27._KCORE_ROUNDS + 1))
    # peeling never grows the graph
    assert (np.diff(res.n_nodes) <= 0).all()
    assert (np.diff(res.n_halfedges) <= 0).all()
    # one extra round changes nothing at the fixtures (fixpoint reached)
    extra = (
        w27._kcore_rounds(spark, SF, w27._KCORE_K, w27._KCORE_ROUNDS + 1)
        .toPandas()
        .sort_values("round")
    )
    last, prev = extra.iloc[-1], extra.iloc[-2]
    assert (last.n_nodes, last.n_halfedges) == (prev.n_nodes, prev.n_halfedges)


def test_kcore_round0_is_the_symmetrized_graph(spark):
    res = all_specs()["q_graph_kcore"].fn(spark, SF).toPandas()
    und = w27._und_edges(spark, SF)
    r0 = res[res["round"] == 0].iloc[0]
    assert r0.n_halfedges == und.count()
    assert r0.n_nodes == und.select("src").distinct().count()


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def test_random_projection_matches_numpy(spark):
    """The registered plan equals the straightforward numpy projection
    of the 6dp-quantized embeddings with the same sign matrix."""
    res = (
        all_specs()["q_emb_random_projection"]
        .fn(spark, SF)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    emb = (
        load(spark, SF, "embeddings").toPandas().set_index("vec_id").sort_index()
    )
    x = np.array(
        [np.round(np.asarray(v, dtype=np.float64), 6) for v in emb.embedding]
    )
    signs = np.array(w27._RP_SIGNS, dtype=np.float64)  # (8, 64)
    y = (x @ signs.T) / math.sqrt(8.0)
    got = res[[f"y{j + 1}" for j in range(w27._RP_OUT)]].values
    assert np.abs(got - y).max() < 2e-6
    ratio = (y * y).sum(axis=1) / (x * x).sum(axis=1)
    assert np.abs(res.norm_ratio.values - ratio).max() < 2e-6


def test_random_projection_signs_are_deterministic():
    assert w27._RP_SIGNS == [
        [w27._rp_sign(i, j) for i in range(w27._RP_IN)]
        for j in range(w27._RP_OUT)
    ]
    flat = [s for row in w27._RP_SIGNS for s in row]
    assert set(flat) == {-1, 1}
    # roughly balanced (binomial over 512 draws)
    assert 0.35 < sum(1 for s in flat if s > 0) / len(flat) < 0.65


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_scipy_formula(spark):
    """Recompute H from raw data with numpy midranks — the registered
    query's exact-bigint reduction must agree to float tolerance."""
    res = all_specs()["q_stats_kruskal_wallis"].fn(spark, SF).toPandas().iloc[0]
    e = load(spark, SF, "events").toPandas()
    vals = e.value.values
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals))
    sv = vals[order]
    i = 0
    r = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2
        r += j - i
        i = j
    n = len(vals)
    h = 0.0
    for t in e.event_type.unique():
        m = e.event_type.values == t
        h += ranks[m].sum() ** 2 / m.sum()
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(sv, return_counts=True)
    tie = float((counts**3 - counts).sum())
    h_corr = h / (1 - tie / (n**3 - n))
    assert res.n_total == n
    assert abs(res.h_stat - h) < 1e-6
    assert abs(res.h_corrected - h_corr) < 1e-6


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_matches_pandas(spark):
    res = all_specs()["q_privacy_l_diversity"].fn(spark, SF).toPandas()
    c = load(spark, SF, "customer").toPandas()
    c["band"] = np.floor(c.c_acctbal / 1000.0).astype(int)
    exp = (
        c.groupby(["c_nationkey", "c_mktsegment"])
        .agg(group_size=("band", "size"), l_distinct=("band", "nunique"))
        .reset_index()
    )
    m = res.merge(exp, on=["c_nationkey", "c_mktsegment"], suffixes=("", "_e"))
    assert len(m) == len(exp) == len(res)
    assert (m.group_size == m.group_size_e).all()
    assert (m.l_distinct == m.l_distinct_e).all()
    assert (m.l_ok == (m.l_distinct >= w27._LDIV_L)).all()
