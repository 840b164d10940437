"""Wave-32 semantics beyond the oracle hash: Kneser-Ney model
properties and a Python recompute."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave32 import _KN_D
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _kn_reference(docs):
    bigrams_per_doc = {}
    bc = Counter()
    for _, r in docs.iterrows():
        tok = [t for t in r.text.split(" ") if t]
        bgs = [f"{a} {b}" for a, b in zip(tok, tok[1:])]
        if bgs:
            bigrams_per_doc[r.doc_id] = bgs
            bc.update(bgs)
    cp = defaultdict(int)
    n1f = defaultdict(int)
    n1p = defaultdict(int)
    for bg, c in bc.items():
        w1, w2 = bg.split(" ")
        cp[w1] += c
        n1f[w1] += 1
        n1p[w2] += 1
    t = len(bc)

    def p(bg):
        w1, w2 = bg.split(" ")
        return (bc[bg] - _KN_D) / cp[w1] + ((_KN_D * n1f[w1]) / cp[w1]) * (
            n1p[w2] / t
        )

    return bigrams_per_doc, p


def test_kneser_ney_matches_python_recompute(spark):
    res = (
        all_specs()["q_text_kneser_ney"]
        .fn(spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    per_doc, p = _kn_reference(docs)
    assert set(res.index) == set(per_doc)
    for doc_id in list(per_doc)[:50]:
        bgs = per_doc[doc_id]
        nll = -sum(math.log(p(bg)) for bg in bgs) / len(bgs)
        row = res.loc[doc_id]
        assert row.n_bigrams == len(bgs)
        assert abs(row.avg_nll_kn - nll) < 1e-5, doc_id


def test_kneser_ney_is_a_proper_distribution_per_prefix(spark):
    """For every prefix, the KN probabilities of its SEEN continuations
    must sum to < 1 (the discount reserves mass for unseen ones) and
    each p must be positive."""
    docs = load(spark, SF, "documents").toPandas()
    per_doc, p = _kn_reference(docs)
    by_prefix = defaultdict(list)
    seen = set()
    for bgs in per_doc.values():
        for bg in bgs:
            if bg not in seen:
                seen.add(bg)
                by_prefix[bg.split(" ")[0]].append(p(bg))
    sums = np.array([sum(v) for v in by_prefix.values()])
    assert (sums > 0).all()
    assert (sums <= 1.0 + 1e-9).all()
