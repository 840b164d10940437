"""Wave-3 analytics: semantic invariants beyond the oracle hash gate."""

from __future__ import annotations

import math

import numpy as np

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_cusum_matches_textbook_recursion(spark):
    """The windowed closed form must equal S_t = max(0, S_{t-1} + d_t)."""
    rows = (
        all_specs()["q_events_cusum"]
        .fn(spark, SF)
        .filter("user_id = 3")
        .orderBy("ts", "event_id")
        .collect()
    )
    assert rows
    s_pos = s_neg = 0.0
    for r in rows:
        d = r["value"] - 55.0
        s_pos = max(0.0, s_pos + d)
        s_neg = max(0.0, s_neg - d)
        assert abs(r["cusum_pos"] - s_pos) < 1e-6, r
        assert abs(r["cusum_neg"] - s_neg) < 1e-6, r


def test_linear_regression_matches_numpy(spark):
    import duckdb

    rows = {r["l_returnflag"]: r for r in all_specs()["q_agg_linear_regression"].fn(spark, SF).collect()}
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT l_returnflag, l_quantity, l_extendedprice FROM '{SF}/lineitem.parquet'"
    ).df()
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp.l_quantity, grp.l_extendedprice, 1)
        r = rows[flag]
        assert abs(r["slope"] - slope) < 1e-3
        assert abs(r["intercept"] - intercept) < 1e-1
        assert 0.0 <= r["r2"] <= 1.0


def test_gaps_islands_partition_events_exactly_once(spark):
    out = all_specs()["q_events_gaps_islands"].fn(spark, SF)
    n_events = out.groupBy().sum("n_events").collect()[0][0]
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert n_events == total  # every event in exactly one island
    bad = out.filter("island_end < island_start").count()
    assert bad == 0


def test_markov_rows_sum_to_one(spark):
    out = all_specs()["q_events_markov_transitions"].fn(spark, SF).collect()
    by_prev: dict[str, float] = {}
    for r in out:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["prob"]
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-12, prev


def test_rfm_quartiles_balanced(spark):
    out = all_specs()["q_customer_rfm"].fn(spark, SF).collect()
    n = len(out)
    for col in ("r_score", "f_score", "m_score"):
        counts = [0] * 5
        for r in out:
            assert 1 <= r[col] <= 4
            counts[r[col]] += 1
        assert max(counts[1:]) - min(counts[1:]) <= 1, (col, counts)
    assert n >= 100


def test_bm25_matches_python_reference(spark):
    import duckdb

    got = {r["doc_id"]: r for r in all_specs()["q_text_bm25"].fn(spark, SF).collect()}
    con = duckdb.connect()
    pdf = con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    toks = {r.doc_id: r.text.split(" ") for r in pdf.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = ("spark", "join", "scan")
    dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    for doc_id, tk in toks.items():
        score = 0.0
        for t in terms:
            tf = tk.count(t)
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(tk) / avgdl)))
        if any(t in tk for t in terms):
            assert doc_id in got
            assert abs(got[doc_id]["bm25"] - score) < 1e-5, doc_id
        else:
            assert doc_id not in got


def test_pack_chunks_arithmetic(spark):
    out = all_specs()["q_pack_concat_chunks"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert r["n_bins"] == (r["total_tokens"] + 1023) // 1024
        assert 0 <= r["n_straddlers"] < r["n_docs"]
        assert 0.0 < r["fill_rate"] <= 1.0


def test_pii_redaction_complete(spark):
    out = all_specs()["q_text_pii_redact"].fn(spark, SF).collect()
    for r in out:
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert "@" not in r["redacted"].replace("<EMAIL>", "")
