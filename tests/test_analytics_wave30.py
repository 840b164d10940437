"""Wave-30 semantics beyond the oracle hash: leakage-freedom of the
PIT join, similarity-search geometry."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_pit_join_is_leakage_free(spark):
    """Recompute every label's features from the raw history with
    pandas and assert the strictly-before contract: features must
    count ONLY events with (ts, event_id) < the label's."""
    res = (
        all_specs()["q_feature_pit_join"]
        .fn(spark, SF)
        .toPandas()
        .set_index("label_id")
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    e = e.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    purchases = e[e.event_type == "purchase"]
    assert set(res.index) == set(purchases.event_id)
    for _, lab in purchases.iterrows():
        hist = e[
            (e.user_id == lab.user_id)
            & (
                (e.ts < lab.ts)
                | ((e.ts == lab.ts) & (e.event_id < lab.event_id))
            )
        ]
        row = res.loc[lab.event_id]
        assert row.n_views_before == (hist.event_type == "view").sum()
        assert row.n_clicks_before == (hist.event_type == "click").sum()
        assert row.n_errors_before == (hist.event_type == "error").sum()
        views = hist[hist.event_type == "view"]
        if len(views):
            assert row.last_view_value == views.iloc[-1].value
        else:
            assert np.isnan(row.last_view_value)
        if len(hist):
            exp_gap = int(lab.ts.value // 1000) - int(
                hist.iloc[-1].ts.value // 1000
            )
            assert row.micros_since_prev == exp_gap
        else:
            assert np.isnan(row.micros_since_prev) or row.micros_since_prev is None


def test_pit_features_never_negative_gap(spark):
    res = all_specs()["q_feature_pit_join"].fn(spark, SF).toPandas()
    gaps = res.micros_since_prev.dropna()
    assert (gaps >= 0).all()


def test_ts_similarity_matches_numpy_pearson(spark):
    res = (
        all_specs()["q_ts_profile_similarity"]
        .fn(spark, SF)
        .toPandas()
        .reset_index(drop=True)
    )
    e = load(spark, SF, "events").toPandas()
    e["hod"] = e.ts.dt.hour
    prof = {}
    for uid, g in e.groupby("user_id"):
        v = np.zeros(24)
        for hod, gg in g.groupby("hod"):
            v[hod] = round(float(gg.value.sum()) / len(gg), 6)
        prof[uid] = v
    qid = min(prof)
    qv = prof[qid]
    corrs = []
    for uid, v in prof.items():
        if uid == qid:
            continue
        c = np.corrcoef(v, qv)[0, 1]
        corrs.append((uid, c))
    corrs.sort(key=lambda t: (-t[1], t[0]))
    exp = corrs[: len(res)]
    assert list(res.user_id) == [u for u, _ in exp]
    got = res.corr if hasattr(res, "corr") and not callable(res.corr) else res["corr"]
    assert np.abs(res["corr"].values - np.array([c for _, c in exp])).max() < 1e-5


def test_ts_similarity_excludes_query_and_bounds(spark):
    res = all_specs()["q_ts_profile_similarity"].fn(spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    qid = e.user_id.min()
    assert qid not in set(res.user_id)
    assert (res["corr"].abs() <= 1.0 + 1e-9).all()
    assert len(res) == 5


def test_rag_retrieval_matches_numpy(spark):
    """Recompute chunking + hashed BOW + cosine top-k in plain Python
    and assert identical ranking."""
    import hashlib

    from weather_flink_spark.plans import analytics_wave30 as w30

    res = (
        all_specs()["q_rag_e2e_retrieval"].fn(spark, SF).toPandas()
    )
    docs = load(spark, SF, "documents").toPandas()

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % w30._RAG_B

    vecs = {}
    for _, r in docs.iterrows():
        tok = [t for t in r.text.split(" ") if t]
        if len(tok) < w30._RAG_CHUNK:
            continue
        for s in range(0, max(len(tok) - w30._RAG_CHUNK + 1, 1), w30._RAG_STRIDE):
            v = np.zeros(w30._RAG_B, dtype=np.int64)
            for t in tok[s : s + w30._RAG_CHUNK]:
                v[bucket(t)] += 1
            vecs[(r.doc_id, s + 1)] = v
    qdoc = min(k[0] for k in vecs)
    qv = vecs[(qdoc, 1)]
    scored = []
    for (d, s), v in vecs.items():
        if d == qdoc:
            continue
        cos = float(v @ qv) / np.sqrt(float(v @ v) * float(qv @ qv))
        scored.append((d, s, round(cos, 9)))
    scored.sort(key=lambda t: (-t[2], t[0], t[1]))
    exp = scored[: w30._RAG_TOPK]
    got = list(zip(res.doc_id, res.chunk_start, res.cosine))
    assert [(d, s) for d, s, _ in got] == [(d, s) for d, s, _ in exp]
    assert np.abs(
        np.array([c for _, _, c in got]) - np.array([c for _, _, c in exp])
    ).max() < 1e-9
