"""Wave-62: next-fit token packing into context windows."""

from __future__ import annotations

import hashlib

import pandas as pd

from weather_flink_spark.plans.analytics_wave62 import PACK_CAP
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _python_pack(sf: str) -> list[tuple[int, int, int, int]]:
    """Independent replay: same shard/order hashes, same next-fit walk,
    plain Python lists (no Spark, no SQL)."""
    d = pd.read_parquet(f"{sf}/documents.parquet")
    rows = []
    for _, r in d.iterrows():
        shard = (
            int(hashlib.md5(f"shard:{r.doc_id}".encode()).hexdigest()[:7], 16)
            % 8
        )
        ok = hashlib.md5(f"order:{r.doc_id}".encode()).hexdigest()
        tok = len(r.text.split(" "))
        rows.append((shard, ok, int(r.doc_id), tok))
    out = []
    for shard in range(8):
        seq = sorted((r for r in rows if r[0] == shard), key=lambda r: (r[1], r[2]))
        bin_id, fill, n = 0, 0, 0
        for _, _, _, tok in seq:
            if bin_id == 0 or fill + tok > PACK_CAP:
                if bin_id > 0:
                    out.append((shard, bin_id, n, fill))
                bin_id, fill, n = bin_id + 1, tok, 1
            else:
                fill, n = fill + tok, n + 1
        if bin_id > 0:
            out.append((shard, bin_id, n, fill))
    return out


def test_nextfit_matches_independent_python_replay(spark):
    got = sorted(
        (r.shard_id, r.bin_id, r.n_docs, r.bin_tokens)
        for r in all_specs()["q_pack_nextfit_bins"].fn(spark, SF).collect()
    )
    assert got == sorted(_python_pack(SF))


def test_nextfit_invariants(spark):
    """Bins conserve tokens, respect the cap except for oversize
    single docs, and every non-final bin is 'full enough' that the
    NEXT shard doc could not have fit (the next-fit property can't be
    asserted per-bin without the order, but conservation + cap bounds
    pin the walk together with the replay test)."""
    rows = all_specs()["q_pack_nextfit_bins"].fn(spark, SF).collect()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    total_tokens = int(sum(len(t.split(" ")) for t in d.text))
    assert sum(r.bin_tokens for r in rows) == total_tokens
    assert sum(r.n_docs for r in rows) == len(d)
    for r in rows:
        assert r.n_docs >= 1
        assert r.bin_tokens <= PACK_CAP or r.n_docs == 1  # oversize = alone
        assert abs(r.fill_pct - r.bin_tokens / PACK_CAP) < 1e-12
    # per (shard, bin) keys are dense from 1
    by_shard: dict[int, set[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, set()).add(r.bin_id)
    for shard, bins in by_shard.items():
        assert bins == set(range(1, len(bins) + 1)), shard
