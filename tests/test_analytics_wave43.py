"""Wave-43: binary quantization + Hamming rerank searcher."""

from __future__ import annotations
import pytest

import numpy as np
import pyarrow.parquet as pq

from weather_flink_spark.plans import analytics_wave43 as w43
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _numpy_codes() -> dict[int, tuple[int, int]]:
    t = pq.read_table(SF + "/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    emb = np.array(t["embedding"].to_pylist())
    out = {}
    for vid, v in zip(ids, emb):
        bits = (v > 0).astype(np.uint64)
        lo = int(sum(int(b) << d for d, b in enumerate(bits[:32])))
        hi = int(sum(int(b) << d for d, b in enumerate(bits[32:])))
        out[int(vid)] = (lo, hi)
    return out


def test_codes_match_numpy_signbits(spark):
    rows = all_specs()["q_emb_binary_quantize"].fn(spark, SF).collect()
    want = _numpy_codes()
    assert len(rows) == len(want)
    for r in rows:
        assert (r.b_lo, r.b_hi) == want[r.vec_id], r.vec_id
        assert r.n_pos_dims == bin(r.b_lo).count("1") + bin(r.b_hi).count("1")
        assert 0 <= r.n_pos_dims <= 64


def test_rerank_matches_numpy_pipeline(spark):
    """Replay the whole searcher in numpy: Hamming top-20 candidates
    (hamming asc, vec_id asc), exact cosine rerank to top-5."""
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES, IVF_TOP_K

    t = pq.read_table(SF + "/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    codes = _numpy_codes()

    got = {}
    for r in all_specs()["q_sim_ann_binary_rerank"].fn(spark, SF).collect():
        got.setdefault(r.query_id, []).append((r.k_rank, r.vec_id, r.hamming))

    for qid in range(IVF_N_QUERIES):
        qlo, qhi = codes[qid]
        ham = np.array(
            [
                bin(qlo ^ codes[int(v)][0]).count("1")
                + bin(qhi ^ codes[int(v)][1]).count("1")
                for v in ids
            ]
        )
        mask = ids != qid
        cand_order = np.lexsort((ids[mask], ham[mask]))[: w43._BQ_CAND]
        cand_ids = ids[mask][cand_order]
        qv = emb[ids == qid][0]
        cos = {}
        for v in cand_ids:
            vv = emb[ids == v][0]
            cos[int(v)] = float(
                qv @ vv / (np.linalg.norm(qv) * np.linalg.norm(vv))
            )
        top = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:IVF_TOP_K]
        want_ids = [v for v, _ in top]
        got_sorted = sorted(got[qid])
        assert [v for _, v, _ in got_sorted] == want_ids, (qid,)
        # hamming column is the scan stage's value
        for _, v, h in got_sorted:
            assert h == bin(qlo ^ codes[v][0]).count("1") + bin(
                qhi ^ codes[v][1]
            ).count("1")


@pytest.mark.slow
def test_binary_recall_shape_and_range(spark):
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES

    rows = all_specs()["q_sim_ann_binary_recall"].fn(spark, SF).collect()
    assert {r.query_id for r in rows} == set(range(IVF_N_QUERIES))
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hit <= r.k
    # the 20-candidate exact rerank should beat the pure-quantized
    # (IVFPQ ADC) searcher on mean recall — the rerank is the point
    pq_rows = all_specs()["q_sim_ann_ivfpq_recall"].fn(spark, SF).collect()
    bq_mean = sum(r.recall_at_k for r in rows) / len(rows)
    pq_mean = sum(r.recall_at_k for r in pq_rows) / len(pq_rows)
    assert bq_mean >= pq_mean - 1e-12, (bq_mean, pq_mean)
