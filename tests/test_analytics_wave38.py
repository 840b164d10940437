"""Wave-38 semantics beyond the oracle hash: rule metrics vs pandas."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave38 import _AR_MIN_CO
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_assoc_rules_match_pandas(spark):
    res = all_specs()["q_orders_assoc_rules"].fn(spark, SF).toPandas()
    li = (
        load(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    n = li.l_orderkey.nunique()
    item = Counter(li.l_partkey)
    co = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g.l_partkey), 2):
            co[(a, b)] += 1
    expected = {
        (a, b): c for (a, b), c in co.items() if c >= _AR_MIN_CO
    }
    # both directions present
    got = {(r.antecedent, r.consequent): r for _, r in res.iterrows()}
    assert len(got) == 2 * len(expected)
    for (a, b), c in expected.items():
        for ant, con in ((a, b), (b, a)):
            r = got[(ant, con)]
            assert r.co == c
            assert r.c_antecedent == item[ant]
            assert r.c_consequent == item[con]
            assert abs(r.confidence - c / item[ant]) < 1e-6
            assert abs(r.lift - n * c / (item[ant] * item[con])) < 1e-5
            lev = (c * n - item[ant] * item[con]) / (n * n)
            assert abs(r.leverage - lev) < 1e-8


def test_assoc_rules_metric_identities(spark):
    """lift > 1 iff leverage > 0 (same sign by definition), and
    confidence <= 1."""
    res = all_specs()["q_orders_assoc_rules"].fn(spark, SF).toPandas()
    assert (res.confidence <= 1.0 + 1e-9).all()
    pos = res[res.lift > 1.0 + 1e-9]
    neg = res[res.lift < 1.0 - 1e-9]
    assert (pos.leverage > 0).all()
    assert (neg.leverage < 0).all()
