"""Wave-37 semantics beyond the oracle hash: Neyman optimality, kNN
accuracy vs numpy."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave37 import _NEY_BUDGET
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_neyman_matches_pandas_and_budget(spark):
    res = (
        all_specs()["q_sample_neyman"]
        .fn(spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    ws = {}
    for t, g in e.groupby("event_type"):
        n = len(g)
        sh = round(math.sqrt(round(g.value.var(ddof=1), 6)), 6)
        ws[t] = n * sh
        row = res.loc[t]
        assert row.n == n
        assert abs(row.sh - sh) < 2e-6
    wt = sum(ws.values())
    nt = len(e)
    for t, g in e.groupby("event_type"):
        row = res.loc[t]
        assert row.n_neyman == math.floor(_NEY_BUDGET * ws[t] / wt)
        assert row.n_proportional == math.floor(_NEY_BUDGET * len(g) / nt)
    # floors keep the total within budget
    assert res.n_neyman.sum() <= _NEY_BUDGET
    assert res.n_proportional.sum() <= _NEY_BUDGET


def test_neyman_shifts_budget_toward_variance(spark):
    """The stratum with the max N*S weight must get at least its
    proportional share; the min-weight-per-row stratum at most."""
    res = all_specs()["q_sample_neyman"].fn(spark, SF).toPandas()
    res["w"] = res.n * res.sh
    hi = res.loc[res.sh.idxmax()]
    lo = res.loc[res.sh.idxmin()]
    assert hi.n_neyman >= hi.n_proportional - 1
    assert lo.n_neyman <= lo.n_proportional + 1


def test_knn_label_accuracy_matches_numpy(spark):
    from weather_flink_spark.plans.analytics_wave20 import knn_edges_table

    res = (
        all_specs()["q_emb_knn_label_accuracy"]
        .fn(spark, SF)
        .toPandas()
        .set_index("label")
        .sort_index()
    )
    edges = knn_edges_table(spark, SF).toPandas()
    lab = (
        load(spark, SF, "embeddings")
        .select("vec_id", "label")
        .toPandas()
        .set_index("vec_id")
        .label.to_dict()
    )
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for s, d in zip(edges.src, edges.dst):
        nbrs[s].append(lab[d])
    correct = Counter()
    total = Counter()
    for v, ls in nbrs.items():
        c = Counter(ls)
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        t = lab[v]
        total[t] += 1
        if best == t:
            correct[t] += 1
    for t in total:
        row = res.loc[t]
        assert row.n == total[t]
        assert row.n_correct == correct[t]
        assert abs(row.accuracy - correct[t] / total[t]) < 1e-6
    # every vector predicted (out-degree >= 1 for all)
    assert res.n.sum() == len(lab)
