"""Wave-45: Markov removal-effect attribution — full python twin."""

from __future__ import annotations

import collections

import duckdb

from weather_flink_spark.plans import analytics_wave45 as w45
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _python_twin() -> dict[str, dict]:
    """Re-derive the whole pipeline independently (dict arithmetic)."""
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT user_id, event_type FROM
            read_parquet('{SF}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user: dict[int, list[str]] = collections.defaultdict(list)
    for u, t in ev:
        by_user[u].append(t)
    counts: collections.Counter = collections.Counter()
    for types in by_user.values():
        prev = "__START__"
        for i, t in enumerate(types):
            counts[(prev, t)] += 1
            if t == w45._CONV:
                prev = "__START__"  # conversion restarts the journey
            else:
                prev = t
                if i == len(types) - 1:
                    counts[(t, "__END__")] += 1
    ctot: collections.Counter = collections.Counter()
    for (s, _), n in counts.items():
        ctot[s] += n
    p6 = {
        (s, d): int(round(n / ctot[s] * w45._SCALE))
        for (s, d), n in counts.items()
    }
    channels = sorted(
        {t for _, t in ev if t != w45._CONV}
    )
    out = {}
    for r in channels + ["__NONE__"]:
        p = collections.defaultdict(int)
        p[w45._CONV] = w45._SCALE
        for _ in range(w45._HOPS):
            nxt = collections.defaultdict(int)
            per_src = collections.defaultdict(int)
            for (s, d), pv in p6.items():
                per_src[s] += pv * p[d]
            for s, acc in per_src.items():
                nxt[s] = 0 if s == r else acc // w45._SCALE
            nxt[w45._CONV] = w45._SCALE
            nxt["__END__"] = 0
            p = nxt
        out[r] = p["__START__"]
    base = out.pop("__NONE__")
    res = {}
    tot_drop = sum(base - v for v in out.values())
    for ch, v in out.items():
        res[ch] = {
            "conv_base6": base,
            "conv_removed6": v,
            "removal_effect": round((base - v) / base, 6) if base else None,
            "attribution_share": round((base - v) / tot_drop, 6)
            if tot_drop
            else None,
        }
    return res


def test_markov_attribution_matches_python_twin(spark):
    rows = all_specs()["q_events_attribution_markov"].fn(spark, SF).collect()
    want = _python_twin()
    assert {r.channel for r in rows} == set(want)
    for r in rows:
        w = want[r.channel]
        assert r.conv_base6 == w["conv_base6"], r.channel
        assert r.conv_removed6 == w["conv_removed6"], r.channel
        assert abs(r.removal_effect - w["removal_effect"]) < 1e-9
        assert abs(r.attribution_share - w["attribution_share"]) < 1e-9


def test_markov_attribution_identities(spark):
    rows = all_specs()["q_events_attribution_markov"].fn(spark, SF).collect()
    # removing a channel can only hurt conversion (edges into it turn
    # into dropouts) — effects in [0, 1]; shares sum to ~1
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0, r
        assert r.conv_removed6 <= r.conv_base6, r
    assert abs(sum(r.attribution_share for r in rows) - 1.0) < 1e-4
