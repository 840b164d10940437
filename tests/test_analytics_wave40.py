"""Wave-40 semantics beyond the oracle hash: entropy rate vs a numpy
recompute and information-theoretic bounds."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _transitions(spark):
    e = (
        load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    trans = Counter()
    for _, g in e.groupby("user_id"):
        types = list(g.event_type)
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    return trans


def test_entropy_rate_matches_numpy(spark):
    res = all_specs()["q_events_entropy_rate"].fn(spark, SF).toPandas().iloc[0]
    trans = _transitions(spark)
    t = sum(trans.values())
    cs = Counter()
    for (a, _), c in trans.items():
        cs[a] += c
    h = -sum(c / t * math.log(c / cs[a]) for (a, _), c in trans.items())
    assert res.n_transitions == t
    assert res.n_states == len(cs)
    assert abs(res.entropy_rate - h) < 1e-6
    assert abs(res.max_entropy - math.log(len(cs))) < 1e-9
    assert abs(res.efficiency - h / math.log(len(cs))) < 1e-5


def test_entropy_rate_bounds(spark):
    res = all_specs()["q_events_entropy_rate"].fn(spark, SF).toPandas().iloc[0]
    assert 0.0 <= res.entropy_rate <= res.max_entropy + 1e-9
    assert 0.0 <= res.efficiency <= 1.0 + 1e-9
