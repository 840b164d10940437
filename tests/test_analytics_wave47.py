"""Wave-47: apriori triples, bitemporal join, boilerplate n-grams."""

from __future__ import annotations

import collections
import itertools

import duckdb

from weather_flink_spark.plans import analytics_wave47 as w47
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_apriori_triples_match_python_and_apriori_property(spark):
    rows = all_specs()["q_orders_apriori_triples"].fn(spark, SF).collect()
    con = duckdb.connect()
    edges = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    baskets: dict[int, list[int]] = collections.defaultdict(list)
    for o, p in edges:
        baskets[o].append(p)
    tri: collections.Counter = collections.Counter()
    pair: collections.Counter = collections.Counter()
    for parts in baskets.values():
        if len(parts) < w47._AP3_MIN_BASKET:
            continue
        ps = sorted(parts)
        for t in itertools.combinations(ps, 3):
            tri[t] += 1
        for t in itertools.combinations(ps, 2):
            pair[t] += 1
    want = {t: c for t, c in tri.items() if c >= w47._AP3_MIN_SUPPORT}
    got = {(r.p1, r.p2, r.p3): r.support for r in rows}
    assert got == want
    # apriori property: every sub-pair of a frequent triple is frequent
    for (p1, p2, p3), s in got.items():
        for sub in ((p1, p2), (p1, p3), (p2, p3)):
            assert pair[sub] >= s >= w47._AP3_MIN_SUPPORT, (sub, s)


def test_bitemporal_join_semantics(spark):
    rows = all_specs()["q_join_bitemporal"].fn(spark, SF).collect()
    con = duckdb.connect()
    orders = con.execute(
        f"""SELECT o_custkey, o_orderdate, o_orderkey
            FROM read_parquet('{SF}/orders.parquet')
            WHERE o_custkey < {w47._BT_PROBE_CUSTS}
            ORDER BY o_custkey, o_orderdate, o_orderkey"""
    ).fetchall()
    hist: dict[int, list] = collections.defaultdict(list)
    for c, d, k in orders:
        hist[c].append(d)
    assert len(rows) == len(hist)
    import datetime as dt

    def as_date(x):
        return x.date() if isinstance(x, dt.datetime) else x

    for r in rows:
        vs = [as_date(v) for v in hist[r.custkey]]
        vf = as_date(r.valid_from)
        aov = as_date(r.as_of_valid)
        aot = as_date(r.as_of_txn)
        # picked version must qualify on BOTH axes
        assert vf <= aov
        # and be the LATEST qualifying valid_from
        assert vf == max(v for v in vs if v <= aov)
        # tier = ordinal of a version with that valid_from; the
        # struct-MAX tie-break keeps the HIGHEST tier among equals
        tiers = [i + 1 for i, v in enumerate(vs) if v == vf]
        assert r.tier == max(tiers)
        # txn-axis actually constrains: a version loaded after
        # as_of_txn (valid_from + delay > as_of_txn) is never picked
        assert vf + dt.timedelta(days=w47._BT_LOAD_DELAY_DAYS) <= aot


def test_boilerplate_ngrams_match_python(spark):
    rows = all_specs()["q_text_boilerplate_ngrams"].fn(spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, lower(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    grams_per_doc: dict[int, list[str]] = {}
    df: collections.Counter = collections.Counter()
    src_of: dict[int, str] = {}
    for did, src, text in docs:
        tok = text.split(" ")
        if len(tok) < w47._BP_N:
            continue
        gs = [
            " ".join(tok[i : i + w47._BP_N])
            for i in range(len(tok) - w47._BP_N + 1)
        ]
        grams_per_doc[did] = gs
        src_of[did] = src
        for g in set(gs):
            df[(src, g)] += 1
    bp = {k for k, c in df.items() if c >= w47._BP_MIN_DOCS}
    got = {r.doc_id: r for r in rows}
    assert set(got) == set(grams_per_doc)
    n_flagged = 0
    for did, gs in grams_per_doc.items():
        r = got[did]
        nb = sum(1 for g in gs if (src_of[did], g) in bp)
        assert r.n_grams == len(gs)
        assert r.n_boiler == nb
        assert abs(r.boiler_frac - round(nb / len(gs), 6)) < 1e-9
        assert r.flagged == (2 * nb >= len(gs))
        n_flagged += int(r.flagged)
    # the word-soup fixture genuinely contains cross-doc repeats:
    # the detector must find SOME boilerplate but not flag everything
    assert 0 < sum(r.n_boiler for r in rows)
    assert n_flagged < len(rows)
