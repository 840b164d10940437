"""Wave-48: PPS systematic sampling — the exactly-n identity + twin."""

from __future__ import annotations

import duckdb

from weather_flink_spark.plans import analytics_wave48 as w48
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _python_twin():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_custkey,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                              * 100, 0) AS BIGINT)
            FROM read_parquet('{SF}/orders.parquet')
            GROUP BY o_custkey ORDER BY o_custkey"""
    ).fetchall()
    seed = con.execute(
        "SELECT CAST(('0x' || substring(md5('pps:offset'), 1, 7))::UBIGINT AS BIGINT)"
    ).fetchone()[0]
    wtot = sum(c for _, c in rows)
    n = w48._PPS_N
    u = 1 + seed % (wtot // n)
    out = {}
    cum = 0
    for ck, cents in rows:
        prev = cum
        cum += cents
        hi = (cum * n - u * n + wtot) // wtot
        lo = (prev * n - u * n + wtot) // wtot
        if hi > lo:
            out[ck] = (cents, hi - lo)
    return out, n


def test_pps_matches_twin_and_draws_exactly_n(spark):
    rows = all_specs()["q_sample_pps_systematic"].fn(spark, SF).collect()
    want, n = _python_twin()
    got = {r.custkey: (r.cents, r.n_hits) for r in rows}
    assert got == want
    # the defining identity of systematic sampling: EXACTLY n draws
    assert sum(h for _, h in got.values()) == n
    # every selected unit drawn at least once; a unit can only take
    # multiple points if its weight spans multiple steps
    wtot = sum(c for c, _ in want.values())  # lower bound on W
    for ck, (cents, hits) in got.items():
        assert hits >= 1
        if hits > 1:
            assert cents * n > wtot  # needs > one step of weight


def test_pps_inclusion_scales_with_weight(spark):
    """PPS property: among selected units, draws are monotone-ish in
    weight — specifically any unit with weight >= 2*W/n must be
    selected (it spans at least one full step)."""
    rows = all_specs()["q_sample_pps_systematic"].fn(spark, SF).collect()
    con = duckdb.connect()
    all_w = dict(
        con.execute(
            f"""SELECT o_custkey,
                       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                  * 100, 0) AS BIGINT)
                FROM read_parquet('{SF}/orders.parquet') GROUP BY o_custkey"""
        ).fetchall()
    )
    wtot = sum(all_w.values())
    selected = {r.custkey for r in rows}
    step = wtot / w48._PPS_N
    for ck, cents in all_w.items():
        if cents >= 2 * step:
            assert ck in selected, (ck, cents, step)
