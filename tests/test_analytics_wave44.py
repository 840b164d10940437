"""Wave-44: cohort retention + HITS — independent pandas/numpy twins."""

from __future__ import annotations

import collections

import duckdb

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_cohort_retention_matches_pandas(spark):
    rows = all_specs()["q_customer_cohort_retention"].fn(spark, SF).collect()
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, o_orderdate FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    act = {(c, d.year * 12 + d.month - 1) for c, d in orders}
    first: dict[int, int] = {}
    for c, m in act:
        first[c] = min(first.get(c, m), m)
    size = collections.Counter(first.values())
    cells: dict[tuple[int, int], set] = {}
    for c, m in act:
        k = m - first[c]
        if k <= 11:
            cells.setdefault((first[c], k), set()).add(c)

    got = {(r.cohort_year * 12 + r.cohort_month - 1, r.k): r for r in rows}
    assert set(got) == set(cells)
    for (m0, k), custs in cells.items():
        r = got[(m0, k)]
        assert r.n_active == len(custs)
        assert r.cohort_size == size[m0]
        assert abs(r.retention - round(len(custs) / size[m0], 6)) < 1e-9
    # identity: month 0 of every cohort is fully retained
    for (m0, k), _ in cells.items():
        if k == 0:
            assert got[(m0, 0)].retention == 1.0


def test_hits_matches_pandas_two_iterations(spark):
    rows = all_specs()["q_graph_hits"].fn(spark, SF).collect()
    con = duckdb.connect()
    edges = set(
        con.execute(
            f"SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{SF}/lineitem.parquet')"
        ).fetchall()
    )
    a1: collections.Counter = collections.Counter(p for _, p in edges)
    h1: dict[int, int] = collections.defaultdict(int)
    for o, p in edges:
        h1[o] += a1[p]
    a2: dict[int, int] = collections.defaultdict(int)
    for o, p in edges:
        a2[p] += h1[o]
    mx = max(a2.values())
    want = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.l_partkey, r.authority_raw) for r in rows] == want
    assert rows[0].authority == 1.0
    for r in rows:
        assert 0.0 < r.authority <= 1.0
        assert abs(r.authority - round(r.authority_raw / mx, 9)) < 1e-12
