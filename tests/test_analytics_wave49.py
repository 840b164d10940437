"""Wave-49: 256-bit thermometer quantization — numpy bit-for-bit
replay of the code build, the Hamming==L1 identity the tier rests on,
and the >=-64-bit recall gate."""

from __future__ import annotations
import pytest

import numpy as np
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from weather_flink_spark.plans import analytics_wave49 as w49
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _corpus() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(SF + "/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], emb[order]


def _numpy_thresholds(ids: np.ndarray, emb: np.ndarray) -> np.ndarray:
    """thr[dim, k-1] = value at sorted position floor(k*n/5) under the
    (value asc, vec_id asc) total order — the plan's exact rule."""
    n = len(ids)
    thr = np.zeros((w49._DIMS, w49._N_THR))
    for dim in range(w49._DIMS):
        order = sorted(range(n), key=lambda i: (emb[i, dim], ids[i]))
        for k in range(1, w49._N_THR + 1):
            thr[dim, k - 1] = emb[order[(k * n) // 5 - 1], dim]
    return thr


def _numpy_codes(ids, emb, thr) -> dict[int, list[int]]:
    out = {}
    for vid, v in zip(ids, emb):
        words = [0, 0, 0, 0]
        for dim in range(w49._DIMS):
            for k in range(1, w49._N_THR + 1):
                if v[dim] > thr[dim, k - 1]:
                    b = 4 * (dim % w49._DIMS_PER_WORD) + k - 1
                    words[dim // w49._DIMS_PER_WORD] |= 1 << b
        # BIGINT wrap: bit 63 is the sign bit
        out[int(vid)] = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return out


def test_thresholds_are_exact_quintile_order_statistics(spark):
    ids, emb = _corpus()
    want = _numpy_thresholds(ids, emb)
    rows = w49.thermo_thresholds_table(spark, SF).collect()
    assert len(rows) == w49._DIMS * w49._N_THR  # bounded 256-row model
    for r in rows:
        assert r.thr == want[r.dim, r.k - 1], (r.dim, r.k)


def test_codes_match_numpy_thermometer(spark):
    ids, emb = _corpus()
    want = _numpy_codes(ids, emb, _numpy_thresholds(ids, emb))
    rows = all_specs()["q_emb_binary256_quantize"].fn(spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert [r.w0, r.w1, r.w2, r.w3] == want[r.vec_id], r.vec_id
        n = sum(bin(w & ((1 << 64) - 1)).count("1") for w in want[r.vec_id])
        assert r.n_bits_set == n
        # quintile thresholds set ~2 of 4 bits per dim on average
        assert 0 <= r.n_bits_set <= 256


def test_hamming_equals_l1_of_quantized_levels(spark):
    """The identity that makes thermometer codes a cosine proxy:
    popcount(xor(codes)) == sum_dim |level_i - level_j| where level =
    #thresholds exceeded."""
    ids, emb = _corpus()
    thr = _numpy_thresholds(ids, emb)
    levels = {
        int(vid): (v[None].T > thr).sum(axis=1) for vid, v in zip(ids, emb)
    }
    codes = _numpy_codes(ids, emb, thr)
    rng = np.random.default_rng(7)
    pick = rng.choice(ids, size=min(30, len(ids)), replace=False)
    for a in pick[:15]:
        for b in pick[15:]:
            ca = [w & ((1 << 64) - 1) for w in codes[int(a)]]
            cb = [w & ((1 << 64) - 1) for w in codes[int(b)]]
            ham = sum(bin(x ^ y).count("1") for x, y in zip(ca, cb))
            l1 = int(np.abs(levels[int(a)] - levels[int(b)]).sum())
            assert ham == l1, (a, b)


@pytest.mark.slow
def test_recall_geq_64bit_tier(spark):
    """What 4x code width buys: the 256-bit thermometer gate must be
    >= the 64-bit sign-code gate at the fixture (measured 0.80 vs
    0.48 at sf0.001; 0.68 vs 0.28 at sf0.1, SURVEY §14)."""
    specs = all_specs()
    r256 = (
        specs["q_sim_ann_binary256_recall"]
        .fn(spark, SF)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    r64 = (
        specs["q_sim_ann_binary_recall"]
        .fn(spark, SF)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    assert r256 >= r64, (r256, r64)
    assert r256 >= 0.6  # absolute floor at the fixture


def test_candidate_pool_is_digit_scaled(spark):
    from weather_flink_spark.plans.analytics_wave20 import corpus_digits

    d = corpus_digits(spark, SF)
    assert d == 3  # 500-row fixture
    assert w49._b256_cand(d) == 20  # pinned to the 64-bit tier's pool
    assert w49._b256_cand(4) == 30  # sf0.1 (2000-vector corpus, d=4)
    rows = all_specs()["q_sim_ann_binary256_rerank"].fn(spark, SF).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = max(per_q.get(r.query_id, 0), r.k_rank)
    assert all(v <= 5 for v in per_q.values())  # top-k after rerank


def test_sampled_model_recall_parity(spark):
    """r8 verdict task #6: the sampled threshold model (seeded-md5
    ~25% sample — the 100 TB build path) must hold recall parity with
    the exact-threshold index: mean recall within one hit of the
    exact tier (1/(5 queries * 5 k) = 0.04) and over the same
    absolute floor."""
    specs = all_specs()
    exact = (
        specs["q_sim_ann_binary256_recall"]
        .fn(spark, SF)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    sampled = (
        specs["q_sim_ann_binary256_sampled_recall"]
        .fn(spark, SF)
        .agg(F.avg("recall_at_k"))
        .collect()[0][0]
    )
    assert sampled >= exact - 0.04, (sampled, exact)
    assert sampled >= 0.6


def test_sampled_thresholds_use_a_proper_subsample(spark):
    """The sampled model must really be built from fewer rows: its
    thresholds differ from the exact model's on at least one dim (a
    25% sample almost surely shifts some order statistic) while both
    stay 256 bounded rows."""
    ex = {(r.dim, r.k): r.thr for r in w49.thermo_thresholds_table(spark, SF).collect()}
    sm = {(r.dim, r.k): r.thr for r in w49.thermo_thresholds_sampled_table(spark, SF).collect()}
    assert len(ex) == len(sm) == 256
    assert any(ex[key] != sm[key] for key in ex)
