"""Wave-64: Benford audit + kNN-graph hubness diagnostic."""

from __future__ import annotations

import math

import pandas as pd

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_benford_shares_and_chi2_identities(spark):
    rows = {r.digit: r for r in all_specs()["q_stats_benford"].fn(spark, SF).collect()}
    assert set(rows) == set(range(1, 10))
    o = pd.read_parquet(f"{SF}/orders.parquet")
    vals = o.o_totalprice[o.o_totalprice >= 1]
    n = len(vals)
    assert sum(r.n_obs for r in rows.values()) == n
    assert abs(sum(r.obs_share for r in rows.values()) - 1.0) < 1e-9
    assert abs(sum(r.exp_share for r in rows.values()) - 1.0) < 1e-12
    # independent digit extraction
    first = vals.apply(lambda v: int(str(int(math.floor(v)))[0]))
    for d in range(1, 10):
        assert rows[d].n_obs == int((first == d).sum())
        assert rows[d].exp_share == math.log10(1 + 1 / d)
        exp_n = n * rows[d].exp_share
        assert abs(rows[d].chi2_term - (rows[d].n_obs - exp_n) ** 2 / exp_n) < 1e-9
    # synthetic uniform-ish prices are NOT Benford — the audit should
    # flag them loudly (chi2 far above the 15.5 p=0.05 critical value
    # for 8 df); pinning that keeps the stat meaningful
    assert sum(r.chi2_term for r in rows.values()) > 15.5


def test_hubness_distribution_identities(spark):
    from weather_flink_spark.plans.analytics_wave20 import (
        _G_KNN,
        knn_edges_table,
    )

    rows = all_specs()["q_emb_knn_hubness"].fn(spark, SF).collect()
    n_nodes = sum(r.n_nodes for r in rows)
    assert n_nodes == 500  # every corpus vector gets a row
    edges = knn_edges_table(spark, SF)
    n_edges = edges.count()
    assert sum(r.in_degree * r.n_nodes for r in rows) == n_edges
    # out-degree is capped at _G_KNN by construction, so total edges
    # <= corpus * degree; in-degree is NOT capped (hubs exceed it)
    assert n_edges <= 500 * _G_KNN
    assert max(r.in_degree for r in rows) > _G_KNN  # hubs exist
    # the near-isotropic fixture has NO antihubs (pin: every node is
    # reachable through edges; if this breaks, flat-tier recall will
    # show it first in the wave-58 panel)
    assert min(r.in_degree for r in rows) > 0
