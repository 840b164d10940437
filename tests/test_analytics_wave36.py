"""Wave-36 semantics beyond the oracle hash: Heaps-law fit vs a numpy
recompute and growth-curve sanity."""

from __future__ import annotations

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave36 import _HEAPS_KS
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_heaps_law_matches_numpy(spark):
    res = all_specs()["q_text_heaps_law"].fn(spark, SF).toPandas().iloc[0]
    docs = load(spark, SF, "documents").toPandas()
    seen = {}
    tokens_per_doc = {}
    for _, r in docs.iterrows():
        toks = [t for t in r.text.split(" ") if t]
        tokens_per_doc[r.doc_id] = len(toks)
        for t in toks:
            if t not in seen or r.doc_id < seen[t]:
                seen[t] = r.doc_id
    ns, vs = [], []
    for k in _HEAPS_KS:
        n = sum(c for d, c in tokens_per_doc.items() if d < k)
        v = sum(1 for fd in seen.values() if fd < k)
        assert res[f"n{k}"] == n
        assert res[f"v{k}"] == v
        ns.append(n)
        vs.append(v)
    x = np.log(np.array(ns, dtype=float))
    y = np.log(np.array(vs, dtype=float))
    beta = (len(x) * (x * y).sum() - x.sum() * y.sum()) / (
        len(x) * (x * x).sum() - x.sum() ** 2
    )
    lnk = (y.sum() - beta * x.sum()) / len(x)
    assert abs(res.heaps_beta - beta) < 1e-7
    assert abs(res.heaps_lnk - lnk) < 1e-7


def test_heaps_growth_is_monotone_and_sublinear(spark):
    res = all_specs()["q_text_heaps_law"].fn(spark, SF).toPandas().iloc[0]
    ns = [res[f"n{k}"] for k in _HEAPS_KS]
    vs = [res[f"v{k}"] for k in _HEAPS_KS]
    assert all(a < b for a, b in zip(ns, ns[1:]))
    assert all(a <= b for a, b in zip(vs, vs[1:]))
    # vocabulary grows sublinearly in tokens: 0 <= beta < 1. The
    # synthetic corpus has a tiny CLOSED vocabulary (~31 tokens,
    # saturated before the first checkpoint), so beta = 0 exactly —
    # which is precisely the 'heavy duplication' reading the
    # diagnostic exists to flag.
    assert 0.0 <= res.heaps_beta < 1.0
    if res.heaps_beta == 0.0:
        assert len(set(vs)) == 1  # flat vocab is the only way to 0
