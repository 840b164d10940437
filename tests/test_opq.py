"""Tests for the OPQ Householder rotation (operators/opq.py, wave 25).

Pins the algebraic guarantees the oracle replay rests on:
- each reflection vector is unit (or exactly zero = identity);
- the chain is orthogonal: it preserves L2 norms to 1e-9;
- the chain does what the allocation wants: principal component c
  lands on coordinate axis c*16 (one dominant direction per PQ
  subspace);
- the registered gate holds: rotated PQ quantization error (the OPQ
  objective) is below the natural-basis error on the test corpus;
- the recall comparison row is structurally sound.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from weather_flink_spark.operators.opq import (
    OPQ_DIM,
    OPQ_M,
    OPQ_SUB,
    fit_opq_householder,
    rotate_embeddings,
)


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    from weather_flink_spark.plans.llm_wave5 import pca_power_model

    return pca_power_model(spark, sf_dir)


@pytest.fixture(scope="module")
def us(model):
    return fit_opq_householder(model)


def _apply_chain(x, us):
    y = list(x)
    for u in us:
        dot = sum(y[i] * u[i] for i in range(len(y)))
        y = [y[i] - 2.0 * dot * u[i] for i in range(len(y))]
    return y


def test_reflections_unit_or_zero(us):
    assert len(us) == OPQ_M
    for u in us:
        nrm = math.sqrt(sum(x * x for x in u))
        assert nrm == 0.0 or abs(nrm - 1.0) < 1e-12


def test_chain_is_orthogonal(us):
    rng = np.random.default_rng(7)
    for _ in range(10):
        x = rng.normal(size=OPQ_DIM)
        y = np.array(_apply_chain(list(x), us))
        assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-9


def test_components_land_on_subspace_axes(model, us):
    """After the chain, component c is +-e_{c*16}: one dominant
    variance direction rotated into each PQ subspace."""
    for c in range(OPQ_M):
        y = _apply_chain([float(v) for v in model["components"][c]], us)
        t = c * OPQ_SUB
        # tolerance bounded by power-iteration convergence (~1e-8
        # residual after 600 steps), not by the reflection algebra
        assert abs(abs(y[t]) - 1.0) < 1e-6, (c, y[t])
        off = math.sqrt(sum(v * v for i, v in enumerate(y) if i != t))
        assert off < 1e-6, (c, off)


def test_rotate_embeddings_matches_driver_chain(spark, sf_dir, us):
    """The Arrow kernel's vectorized fold equals the scalar driver
    chain bit-for-bit on real rows (same ascending op order)."""
    from weather_flink_spark.operators import pca
    from weather_flink_spark.io import load

    e = pca.quantize_embeddings(
        load(spark, sf_dir, "embeddings"), "embedding", dim=OPQ_DIM
    ).limit(20)
    rows = {
        r["vec_id"]: r["rot"]
        for r in rotate_embeddings(e, "embedding", us).collect()
    }
    for r in e.collect():
        x = [float(v) for v in r["embedding"]]
        expect = _apply_chain(x, us)
        got = rows[r["vec_id"]]
        assert all(a == b for a, b in zip(expect, got)), r["vec_id"]


def test_opq_objective_improves(spark, sf_dir):
    from weather_flink_spark.plans.analytics_wave25 import q_emb_opq_rotate

    rows = q_emb_opq_rotate(spark, sf_dir).collect()
    assert len(rows) == OPQ_M
    assert all(r["opq_improves_total"] for r in rows)
    assert sum(r["err_opq"] for r in rows) < sum(r["err_nat"] for r in rows)


def test_adc_recall_row_shape(spark, sf_dir):
    from weather_flink_spark.plans.analytics_wave25 import q_emb_opq_adc_recall

    rows = q_emb_opq_adc_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["n_hit_nat"] <= 5 and 0 <= r["n_hit_opq"] <= 5
        assert r["recall_nat"] == r["n_hit_nat"] / 5.0
        assert r["recall_opq"] == r["n_hit_opq"] / 5.0


def test_stream_ann_search_equals_batch_searcher(spark, sf_dir):
    """The streaming query path answers exactly what the batch IVF
    searcher answers on the same vectors (round-6 verdict #7 gate)."""
    from weather_flink_spark.plans.analytics_wave25 import run_ann_search_stream
    from weather_flink_spark.plans.llm_extra import q_sim_ann_ivf
    from pyspark.sql import functions as F

    streamed = {
        (r["query_id"], r["k_rank"]): (r["vec_id"], r["cell"], r["cosine"])
        for r in run_ann_search_stream(spark, sf_dir).collect()
    }
    batch = {
        (r["query_id"], r["k_rank"]): (r["vec_id"], r["cell"], r["cosine"])
        for r in q_sim_ann_ivf(spark, sf_dir)
        .select("query_id", "vec_id", "cell", F.round("cosine", 6).alias("cosine"), "k_rank")
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
