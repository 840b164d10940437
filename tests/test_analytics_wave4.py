"""Wave-4 analytics: semantic invariants beyond the oracle hash gate."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_entropy_bounds_and_numpy_parity(spark):
    rows = all_specs()["q_agg_entropy"].fn(spark, SF).collect()
    assert rows
    con = duckdb.connect()
    pdf = con.execute(
        f"""SELECT event_type, epoch_us(ts)//3600000000 % 24 AS hr, COUNT(*) c
            FROM '{SF}/events.parquet' GROUP BY 1,2"""
    ).df()
    for r in rows:
        # entropy of a 24-bucket histogram lives in [0, log2 24]
        assert 0.0 <= r["entropy_bits"] <= math.log2(24) + 1e-9
        grp = pdf[pdf.event_type == r["event_type"]]
        p = grp.c.to_numpy() / grp.c.sum()
        h = float(-(p * np.log2(p)).sum())
        assert abs(r["entropy_bits"] - h) < 1e-5, (r, h)
        assert r["n_hours"] == len(grp)


def test_abc_classes_partition_customers(spark):
    rows = {r["abc_class"]: r for r in all_specs()["q_orders_abc_pareto"].fn(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_cust = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    share = sum(r["revenue_share"] for r in rows.values())
    assert abs(share - 1.0) < 1e-5
    # Pareto shape: A holds at most 80%+one customer's worth, and A's
    # per-customer revenue dominates C's
    a, c = rows["A"], rows["C"]
    assert a["class_revenue"] / a["n_customers"] > c["class_revenue"] / c["n_customers"]


def test_chisq_matches_scipy_free_formula(spark):
    r = all_specs()["q_stats_chisq"].fn(spark, SF).collect()[0]
    con = duckdb.connect()
    pdf = con.execute(
        f"""SELECT event_type,
                   CASE WHEN (epoch_us(ts)//86400000000 + 4) % 7 IN (0,6) THEN 1 ELSE 0 END wknd,
                   COUNT(*) c
            FROM '{SF}/events.parquet' GROUP BY 1,2"""
    ).df()
    tab = pdf.pivot_table(index="event_type", columns="wknd", values="c", fill_value=0)
    obs = tab.to_numpy().astype(float)
    rtot = obs.sum(axis=1, keepdims=True)
    ctot = obs.sum(axis=0, keepdims=True)
    exp = rtot * ctot / obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert abs(r["chi2"] - chi2) < 1e-4
    assert r["dof"] == obs.shape[0] - 1  # (R-1)*(C-1) with C=2
    assert r["n"] == int(obs.sum())


def test_attribution_counts_consistent(spark):
    r = all_specs()["q_events_attribution"].fn(spark, SF).collect()[0]
    n_purch = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet' WHERE event_type='purchase'"
    ).fetchone()[0]
    assert r["n_purchases"] == n_purch
    assert 0 <= r["n_attributed"] <= r["n_purchases"]
    if r["n_attributed"]:
        assert 0.0 <= r["avg_lag_s"] <= 86400.0


def test_triangles_match_bruteforce(spark):
    r = all_specs()["q_graph_triangles"].fn(spark, SF).collect()[0]
    con = duckdb.connect()
    edges = con.execute(
        f"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'),
            pairs AS (SELECT a.l_partkey p1, b.l_partkey p2 FROM items a JOIN items b
                      ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey)
            SELECT p1, p2 FROM pairs GROUP BY 1,2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    es = set(map(tuple, edges))
    nodes = {p for e in es for p in e}
    tri = sum(
        1
        for (a, b) in es
        for c in nodes
        if b < c and (b, c) in es and (a, c) in es
    )
    assert r["n_edges"] == len(es)
    assert r["n_nodes"] == len(nodes)
    assert r["n_triangles"] == tri


def test_weighted_median_is_weighted_midpoint(spark):
    rows = all_specs()["q_agg_weighted_median"].fn(spark, SF).collect()
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT l_returnflag, l_extendedprice, l_quantity FROM '{SF}/lineitem.parquet'"
    ).df()
    for r in rows:
        grp = pdf[pdf.l_returnflag == r["l_returnflag"]].sort_values("l_extendedprice")
        cum = grp.l_quantity.cumsum()
        tot = grp.l_quantity.sum()
        expected = float(grp.l_extendedprice[cum >= tot / 2].iloc[0])
        assert r["weighted_median"] == expected
        assert abs(r["total_weight"] - float(tot)) < 1e-6


def test_tpch_q10_topk_ordered(spark):
    rows = all_specs()["q_sql_tpch_q10"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r["revenue"] > 0 for r in rows)


def test_containment_asymmetry_and_bounds(spark):
    rows = all_specs()["q_dedup_containment"].fn(spark, SF).collect()
    for r in rows:
        assert 0.0 < r["cont_a_in_b"] <= 1.0
        assert 0.0 < r["cont_b_in_a"] <= 1.0
        assert max(r["cont_a_in_b"], r["cont_b_in_a"]) >= 0.5
        assert r["n_shared"] >= 1


def test_holt_winters_matches_python_recursion(spark):
    out = {r["event_type"]: r for r in all_specs()["q_events_holt_winters"].fn(spark, SF).collect()}
    assert out
    # rebuild the dense hourly count series independently and re-run the
    # textbook triple recursion
    pdf = duckdb.sql(
        f"""SELECT event_type, epoch_us(ts)//3600000000 AS h FROM '{SF}/events.parquet'"""
    ).df()
    hmin, hmax = int(pdf.h.min()), int(pdf.h.max())
    # dyadic constants + sequential-fold init: the oracle-exact contract
    m, alpha, beta, gamma = 24, 0.5, 0.25, 0.25
    for et, grp in pdf.groupby("event_type"):
        counts = grp.groupby("h").size()
        y = np.array([float(counts.get(h, 0)) for h in range(hmin, hmax + 1)])
        assert len(y) >= 2 * m
        acc1 = 0.0
        for v in y[:m]:
            acc1 = acc1 + v
        m1 = acc1 / m
        acc2 = 0.0
        for v in y[m : 2 * m]:
            acc2 = acc2 + v
        s = m1
        b = (acc2 / m - m1) / m
        seas = y[:m] - m1
        for t in range(m, len(y)):
            ci = t % m
            s_prev = s
            s = alpha * (y[t] - seas[ci]) + (1 - alpha) * (s + b)
            b = beta * (s - s_prev) + (1 - beta) * b
            seas[ci] = gamma * (y[t] - s) + (1 - gamma) * seas[ci]
        r = out[et]
        assert r["n_obs"] == len(y)
        assert abs(r["level"] - s) < 1e-9
        assert abs(r["trend"] - b) < 1e-9
        assert abs(r["forecast_next"] - (s + b + seas[len(y) % m])) < 1e-9


def test_chunking_covers_every_token(spark):
    """Chunks at stride 12 / size 16 must tile each doc: first chunk
    starts at token 1, consecutive chunks overlap by 4, and the union
    covers all n tokens exactly."""
    rows = all_specs()["q_text_chunk_overlap"].fn(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    pdf = duckdb.sql(
        f"SELECT doc_id, len(string_split(text,' ')) n FROM '{SF}/documents.parquet'"
    ).df()
    n_by_doc = dict(zip(pdf.doc_id, pdf.n))
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = int(n_by_doc[doc_id])
        assert len(chunks) == chunks[0]["n_chunks"]
        covered_end = 0
        for r in chunks:
            start = r["chunk_id"] * 12  # 0-based
            assert start <= covered_end  # no gap
            covered_end = max(covered_end, start + r["chunk_len"])
            assert r["chunk_len"] <= 16
        assert covered_end == n  # full coverage


def test_tpch_q6_revenue_positive_and_selective(spark):
    r = all_specs()["q_sql_tpch_q6"].fn(spark, SF).collect()[0]
    total = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    assert 0 < r["n_rows"] < total * 0.2  # the predicates are selective
    assert r["revenue"] > 0


def test_tpch_q18_all_orders_exceed_threshold(spark):
    rows = all_specs()["q_sql_tpch_q18"].fn(spark, SF).collect()
    assert rows
    assert all(r["sum_qty"] > 150 for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_kmeans_matches_numpy_lloyd(spark):
    rows = {r["cid"]: r for r in all_specs()["q_emb_kmeans_lloyd"].fn(spark, SF).collect()}
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    cent = X[:8].copy()
    for _ in range(2):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # ties break to lowest cid, matching the query
        cent = np.stack([X[assign == k].mean(axis=0) for k in range(8)])
    d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    for k in range(8):
        n_k = int((assign == k).sum())
        r = rows[k]
        assert r["n_points"] == n_k
        assert abs(r["inertia"] - d[assign == k, k].sum()) < 1e-3
        assert abs(r["c_first"] - cent[k, 0]) < 1e-6
        assert abs(r["c_norm2"] - (cent[k] ** 2).sum()) < 1e-6
    assert sum(r["n_points"] for r in rows.values()) == len(X)


def test_target_mix_rebalances_toward_equal_shares(spark):
    rows = all_specs()["q_sample_target_mix"].fn(spark, SF).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    total_sampled = sum(r["n_sampled"] for r in rows)
    assert 0 < total_sampled <= total_docs
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert r["n_sampled"] <= r["n_docs"]
    # the sampled mix must be flatter than the raw mix: the max share
    # can only shrink (hash noise aside) vs the raw language share
    raw_max = max(r["n_docs"] / total_docs for r in rows)
    sampled_max = max(r["achieved_share"] for r in rows)
    assert sampled_max <= raw_max + 0.05
    assert abs(sum(r["achieved_share"] for r in rows) - 1.0) < 1e-5


def test_pct_of_parent_shares_sum_to_one(spark):
    rows = all_specs()["q_agg_pct_of_parent"].fn(spark, SF).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    region_pcts = {}
    for region, nations in by_region.items():
        assert abs(sum(n["pct_of_region"] for n in nations) - 1.0) < 1e-4
        pcts = {n["region_pct_of_total"] for n in nations}
        assert len(pcts) == 1  # constant within a region
        region_pcts[region] = pcts.pop()
    assert abs(sum(region_pcts.values()) - 1.0) < 1e-4


def test_salted_join_equals_plain_join(spark):
    out = all_specs()["q_join_skew_salted"].fn(spark, SF)
    got = out.count()
    expected = duckdb.sql(
        f"""SELECT COUNT(*) FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey
            WHERE p.p_size >= 40"""
    ).fetchone()[0]
    assert got == expected
    assert "__salt" not in out.columns  # the salt never leaks


def test_product_aggregate_matches_numpy(spark):
    rows = {r["user_id"]: r for r in all_specs()["q_agg_product"].fn(spark, SF).collect()}
    pdf = duckdb.sql(
        f"""SELECT user_id, ts, event_id, 1.0 + value/1000.0 AS f
            FROM '{SF}/events.parquet' WHERE event_type='purchase'
            ORDER BY user_id, ts, event_id"""
    ).df()
    for uid, grp in pdf.groupby("user_id"):
        acc = 1.0
        for f in grp.f:  # same sequential order as both engines
            acc *= float(f)
        r = rows[uid]
        assert r["n_factors"] == len(grp)
        assert abs(r["compound_factor"] - acc) < 1e-6


def test_funnel_windowed_monotone_stages(spark):
    r = all_specs()["q_events_funnel_windowed"].fn(spark, SF).collect()[0]
    assert r["n_users_view"] >= r["n_users_qualified_click"] >= r["n_users_converted"]
    assert r["n_users_view"] > 0
    # the windowed funnel can never beat the order-only funnel
    loose = all_specs()["q_events_funnel"].fn(spark, SF).collect()
    loose_converted = sum(
        row["n_users"] for row in loose if row.asDict().get("stage") == "purchase"
    ) if loose and "stage" in loose[0].asDict() else None
    if loose_converted is not None:
        assert r["n_users_converted"] <= loose_converted


def test_ivf_learned_neighbors_share_cell_and_rank_by_distance(spark):
    rows = all_specs()["q_sim_ann_ivf_learned"].fn(spark, SF).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, neigh in by_q.items():
        neigh.sort(key=lambda r: r["k_rank"])
        assert len(neigh) <= 5
        assert all(r["vec_id"] != qid for r in neigh)
        cells = {r["cell"] for r in neigh}
        assert len(cells) == 1  # nprobe=1: all hits from the query's cell
        d2s = [r["d2q"] for r in neigh]
        assert d2s == sorted(d2s)


def test_perplexity_scores_all_multiword_docs(spark):
    rows = all_specs()["q_text_perplexity_bigram"].fn(spark, SF).collect()
    n_docs = duckdb.sql(
        f"""SELECT COUNT(*) FROM '{SF}/documents.parquet'
            WHERE len(list_filter(string_split(text,' '), t -> t <> '')) >= 2"""
    ).fetchone()[0]
    assert len(rows) == n_docs
    for r in rows:
        assert r["avg_nll"] >= 0.0  # -mean(ln p), p <= 1
        assert r["n_bigrams"] >= 1


def test_paths_topk_counts_and_order(spark):
    rows = all_specs()["q_events_paths_topk"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 10
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == 3


def test_nearest_dup_symmetric_and_unique(spark):
    rows = all_specs()["q_dedup_nearest_per_doc"].fn(spark, SF).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(by_doc) == len(rows)  # one nearest per doc
    for r in rows:
        assert r["doc_id"] != r["nearest_dup"]
        assert 0.5 <= r["jaccard"] <= 1.0  # pairs pass the verify threshold
        # nearness is mutual membership: the partner also has a nearest
        assert r["nearest_dup"] in by_doc


def test_key_skew_ratios_consistent(spark):
    rows = all_specs()["q_diag_key_skew"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    cs = [r["c"] for r in rows]
    assert cs == sorted(cs, reverse=True)
    n_keys = rows[0]["n_keys"]
    total = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'").fetchone()[0]
    for r in rows:
        expected_ratio = r["c"] / (total / n_keys)
        assert abs(r["skew_ratio"] - expected_ratio) < 1e-4


def test_ab_proportions_counts_and_z(spark):
    r = all_specs()["q_stats_ab_proportions"].fn(spark, SF).collect()[0]
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert r["n0"] + r["n1"] == n_users
    assert 0 <= r["c0"] <= r["n0"] and 0 <= r["c1"] <= r["n1"]
    if r["z_score"] is not None:
        # z must match the textbook pooled formula recomputed in python
        import math
        p0, p1 = r["c0"] / r["n0"], r["c1"] / r["n1"]
        pool = (r["c0"] + r["c1"]) / (r["n0"] + r["n1"])
        z = (p1 - p0) / math.sqrt(pool * (1 - pool) * (1 / r["n0"] + 1 / r["n1"]))
        assert abs(r["z_score"] - z) < 1e-5


def test_frame_sample_reconstructs_text_slices(spark):
    rows = all_specs()["q_multimodal_frame_sample"].fn(spark, SF).collect()
    assert rows
    import hashlib
    texts = dict(
        duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    )
    for r in rows[:50]:
        sl = texts[r["doc_id"]].encode()[r["frame_idx"] * 32 : (r["frame_idx"] + 1) * 32]
        assert r["frame_bytes"] == len(sl)
        assert r["frame_md5"] == hashlib.md5(sl).hexdigest()
        assert r["frame_idx"] % 4 == 0


def test_inter_arrival_gap_accounting(spark):
    rows = all_specs()["q_events_inter_arrival"].fn(spark, SF).collect()
    pdf = duckdb.sql(
        f"SELECT event_type, COUNT(*) n, epoch_us(MAX(ts)) - epoch_us(MIN(ts)) span "
        f"FROM '{SF}/events.parquet' GROUP BY 1"
    ).df()
    info = {r.event_type: r for r in pdf.itertuples()}
    for r in rows:
        i = info[r["event_type"]]
        assert r["n_gaps"] == i.n - 1  # one gap fewer than events
        assert r["total_us"] == i.span  # gaps telescope to the span
        assert r["min_gap_us"] <= r["p50_gap_us"] <= r["max_gap_us"]


def test_zipf_slope_negative_and_plausible(spark):
    r = all_specs()["q_text_zipf_slope"].fn(spark, SF).collect()[0]
    assert r["n"] <= 1000
    # rank-frequency must fall: slope strictly negative, and not absurd
    assert -5.0 < r["zipf_slope"] < 0.0
    assert r["intercept"] > 0.0


def test_anomaly_density_matches_numpy(spark):
    rows = all_specs()["q_emb_anomaly_density"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    scores = [r["anomaly_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # recompute the top score with numpy end-to-end
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    vec_ids = emb.vec_id.to_numpy()
    idx = np.arange(64)
    planes = np.stack(
        [((1103515245 * (64 * p + idx) + 12345) % 97) - 48 for p in range(4)]
    ).astype(np.float64)
    proj = X @ planes.T  # (n, 4)
    score = np.zeros(len(X))
    for p in range(4):
        x = proj[:, p]
        b = np.minimum(np.floor((x - x.min()) / (x.max() - x.min()) * 16).astype(int), 15)
        counts = np.bincount(b, minlength=16)
        score += -np.log(counts[b] / len(X))
    score /= 4
    top = rows[0]
    i = int(np.where(vec_ids == top["vec_id"])[0][0])
    assert abs(top["anomaly_score"] - score[i]) < 1e-4
    assert score.max() - 1e-6 <= score[i]  # the reported top is the true max


def test_mix_shift_effects_telescope_to_delta(spark):
    rows = all_specs()["q_orders_mix_shift"].fn(spark, SF).collect()
    assert rows
    avg0, avg1 = duckdb.sql(
        f"""SELECT
              SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN o_totalprice END)
              / COUNT(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 1 END),
              SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN o_totalprice END)
              / COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 END)
            FROM '{SF}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'"""
    ).fetchone()
    total_effect = sum(r["rate_effect"] + r["mix_effect"] for r in rows)
    assert abs(total_effect - (avg1 - avg0)) < 1e-3  # decomposition identity
    assert abs(sum(r["w0"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["w1"] for r in rows) - 1.0) < 1e-4
