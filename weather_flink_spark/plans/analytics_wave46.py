"""Wave-46 operators (round 7): burst detection + spectral shape.

- ``q_events_burst_kleinberg`` — Kleinberg's 2-state burst automaton
  (KDD 2002) over per-user inter-arrival gaps: state q0 emits at the
  user's base rate λ0 = (n−1)/span, state q1 at s·λ0 (s=2), entering
  a burst costs γ·ln n. The 2-state Viterbi cost recursion collapses
  to ONE scalar recurrence on the cost difference D = C1 − C0:
      D_t = least(T, D_{t−1}) − least(0, D_{t−1}) + (λ0·g_t − ln s)
  (T = γ·ln n snapped once to 9 dp, ln s injected as a Python literal
  — the Goertzel constant discipline), and the forward-filtered burst
  flag is D_t < 0. Per user: burst event count and episode count —
  the "is this account suddenly hammering us" signal behind every
  rate-anomaly dashboard, complementing q_events_cusum (level shifts)
  with the point-process view.
- ``q_multimodal_spectral_centroid`` — spectral shape of the raw-PCM
  audio payloads: FOUR Goertzel bins (f = 1/16..4/16 cycles/sample,
  each 2cos constant injected once from Python) evaluated in one O(4N)
  recursion, then centroid = Σ f·P / ΣP and bandwidth = the
  power-weighted frequency spread — the two features an audio
  curation gate uses to split tones from noise, composing the
  wave-39 single-bin kernel into a real spectral descriptor.

Both are the Holt/Kalman/Goertzel distributed-sequential class:
applyInPandas per key (parallelism = |keys|), recursion replayed
bit-exactly by a recursive-CTE oracle, raw doubles out of the kernel,
rounding only in the PLAN.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_BURST_S = 2.0  # burst rate multiplier
_BURST_GAMMA = 1.0  # transition cost weight (gamma * ln n)
_LN_S = math.log(_BURST_S)  # injected literal: no engine runs ln(2)
_BURST_MIN_EVENTS = 3
_D0 = 1.0e18  # "cannot start in burst" sentinel for D = C1 - C0


def _dlit(v: float) -> str:
    """Inject a Python double into DuckDB SQL LOSSLESSLY.

    A bare float literal like 1.8477590650225735 is typed DECIMAL by
    DuckDB and converted to double with an ulp of drift (measured:
    ...5735 parses as ...5737), which broke the 4-bin recursion's
    bit-parity; CAST('<repr>' AS DOUBLE) goes through the correctly-
    rounded string->double path and round-trips exactly."""
    return f"CAST('{v!r}' AS DOUBLE)"


@register(
    "q_events_burst_kleinberg",
    oracle=f"""
        WITH RECURSIVE ser AS MATERIALIZED (
            SELECT user_id,
                   LIST(CAST(epoch_us(ts) AS BIGINT)
                        ORDER BY ts ASC, event_id ASC) AS ts_us
            FROM events
            GROUP BY user_id
        ),
        base AS MATERIALIZED (
            SELECT user_id, ts_us,
                   CAST(len(ts_us) AS BIGINT) AS n,
                   (ts_us[len(ts_us)] - ts_us[1]) AS span_us
            FROM ser
            WHERE len(ts_us) >= {_BURST_MIN_EVENTS}
              AND ts_us[len(ts_us)] > ts_us[1]
        ),
        params AS MATERIALIZED (
            SELECT user_id, ts_us, n,
                   (CAST(n - 1 AS DOUBLE) * 1000000.0)
                       / CAST(span_us AS DOUBLE) AS lam0,
                   ROUND({_dlit(_BURST_GAMMA)} * LN(CAST(n AS DOUBLE)), 9) AS t_pen
            FROM base
        ),
        rec(user_id, t, d, n_burst, n_epi, prev_burst) AS (
            SELECT user_id, CAST(1 AS BIGINT), CAST({_dlit(_D0)} AS DOUBLE),
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT), FALSE
            FROM params
            UNION ALL
            SELECT r.user_id, r.t + 1,
                   (LEAST(p.t_pen, r.d) - LEAST(CAST(0.0 AS DOUBLE), r.d))
                   + (p.lam0
                      * (CAST(p.ts_us[CAST(r.t + 1 AS INTEGER)]
                              - p.ts_us[CAST(r.t AS INTEGER)] AS DOUBLE)
                         / 1000000.0)
                      - {_dlit(_LN_S)}),
                   r.n_burst + CASE WHEN
                       (LEAST(p.t_pen, r.d) - LEAST(CAST(0.0 AS DOUBLE), r.d))
                       + (p.lam0
                          * (CAST(p.ts_us[CAST(r.t + 1 AS INTEGER)]
                                  - p.ts_us[CAST(r.t AS INTEGER)] AS DOUBLE)
                             / 1000000.0)
                          - {_dlit(_LN_S)}) < 0 THEN 1 ELSE 0 END,
                   r.n_epi + CASE WHEN NOT r.prev_burst AND
                       (LEAST(p.t_pen, r.d) - LEAST(CAST(0.0 AS DOUBLE), r.d))
                       + (p.lam0
                          * (CAST(p.ts_us[CAST(r.t + 1 AS INTEGER)]
                                  - p.ts_us[CAST(r.t AS INTEGER)] AS DOUBLE)
                             / 1000000.0)
                          - {_dlit(_LN_S)}) < 0 THEN 1 ELSE 0 END,
                   (LEAST(p.t_pen, r.d) - LEAST(CAST(0.0 AS DOUBLE), r.d))
                   + (p.lam0
                      * (CAST(p.ts_us[CAST(r.t + 1 AS INTEGER)]
                              - p.ts_us[CAST(r.t AS INTEGER)] AS DOUBLE)
                         / 1000000.0)
                      - {_dlit(_LN_S)}) < 0
            FROM rec r JOIN params p ON p.user_id = r.user_id
            WHERE r.t < p.n
        )
        SELECT r.user_id, p.n AS n_events,
               ROUND(p.lam0, 9) AS lambda0,
               r.n_burst AS n_burst_events,
               r.n_epi AS n_episodes
        FROM rec r JOIN params p ON p.user_id = r.user_id
        WHERE r.t = p.n
    """,
    doc=(
        "Kleinberg 2-state burst detection (KDD 2002) per user: the "
        "two-state Viterbi cost recursion collapsed to one scalar "
        "recurrence on D = C1−C0 (D' = least(T,D) − least(0,D) + "
        "λ0·g − ln s), forward-filtered burst flag D<0, per-user "
        "burst-event and episode counts — the point-process rate "
        "anomaly signal complementing q_events_cusum's level shifts. "
        "Parity: ln s is an injected Python literal (no engine runs "
        "it), T = γ·ln n snaps ONCE to 9 dp, λ0 = (n−1)e6/span_us is "
        "one double division of exact integers, every other op is "
        "fixed-order IEEE arithmetic — the recursive-CTE oracle "
        "replays the fold bit-exactly (the Holt/Kalman/Goertzel "
        "class). Scale: applyInPandas per user, parallelism = "
        "|users|, state = one double."
    ),
    tags=("events", "timeseries", "anomaly", "pandas-udf"),
)
def q_events_burst_kleinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # ONE row per user (ordered timestamp list) BEFORE the Python
    # crossing: per-user applyInPandas groups cost ~ms of Arrow
    # round-trip each (1500 users = seconds of pure overhead); the
    # wave-39 pattern — collapse to a row per key, then mapInPandas
    # over 32 hash partitions — keeps the Python side at 32 calls.
    # sort_array on (t_us, event_id) structs == ORDER BY ts, event_id.
    ser = (
        e.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t_us"), F.col("event_id")
            ).alias("te"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("te")).alias("seq"))
        .select("user_id", F.col("seq.t_us").alias("ts_us"))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            ts_us = row.ts_us
            n = len(ts_us)
            if n < _BURST_MIN_EVENTS or ts_us[-1] <= ts_us[0]:
                continue
            lam0 = (float(n - 1) * 1000000.0) / float(
                int(ts_us[-1]) - int(ts_us[0])
            )
            # T snapped once to 9 dp like the oracle's ROUND(LN(n), 9)
            t_pen = round(_BURST_GAMMA * math.log(float(n)), 9)
            d = _D0
            n_burst = 0
            n_epi = 0
            prev = False
            for i in range(1, n):
                g = float(int(ts_us[i]) - int(ts_us[i - 1])) / 1000000.0
                d = (min(t_pen, d) - min(0.0, d)) + (lam0 * g - _LN_S)
                if d < 0:
                    n_burst += 1
                    if not prev:
                        n_epi += 1
                    prev = True
                else:
                    prev = False
            out.append((int(row.user_id), n, lam0, n_burst, n_epi))
        return pd.DataFrame(
            out,
            columns=[
                "user_id",
                "n_events",
                "lambda0_raw",
                "n_burst_events",
                "n_episodes",
            ],
        )

    folded = ser.repartition(32, "user_id").mapInPandas(
        lambda it: (kernel(pdf) for pdf in it),
        schema="user_id bigint, n_events bigint, lambda0_raw double,"
        " n_burst_events bigint, n_episodes bigint",
    )
    return folded.select(
        "user_id",
        "n_events",
        F.round(F.col("lambda0_raw"), 9).alias("lambda0"),
        "n_burst_events",
        "n_episodes",
    )


# ---------------------------------------------------------------------------
# 4-bin spectral centroid over the PCM payloads
# ---------------------------------------------------------------------------

_SC_BINS = (1, 2, 3, 4)  # f_k = k/16 cycles per sample
_SC_C = {k: 2.0 * math.cos(2.0 * math.pi * k / 16.0) for k in _SC_BINS}
_SC_F = {k: k / 16.0 for k in _SC_BINS}


def _sc_oracle() -> str:
    state_cols = ", ".join(f"a{k}, b{k}" for k in _SC_BINS)
    init = ", ".join(
        "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)" for _ in _SC_BINS
    )
    step = ", ".join(
        f"(CAST(s.pcm[CAST(r.t + 1 AS INTEGER)] AS DOUBLE)"
        f" + {_dlit(_SC_C[k])} * r.a{k}) - r.b{k}, r.a{k}"
        for k in _SC_BINS
    )
    powers = ", ".join(
        f"(f.a{k} * f.a{k} + f.b{k} * f.b{k})"
        f" - {_dlit(_SC_C[k])} * f.a{k} * f.b{k} AS p{k}"
        for k in _SC_BINS
    )
    p_sum = " + ".join(f"p{k}" for k in _SC_BINS)
    fp_sum = " + ".join(f"{_dlit(_SC_F[k])} * p{k}" for k in _SC_BINS)
    return f"""
        WITH RECURSIVE s AS MATERIALIZED (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                       i -> CASE WHEN ascii(text[CAST(i AS INTEGER)]) < 128
                                 THEN ascii(text[CAST(i AS INTEGER)])
                                 ELSE ascii(text[CAST(i AS INTEGER)]) - 256
                            END) AS pcm
            FROM documents
        ),
        meta AS MATERIALIZED (
            SELECT doc_id, CAST(len(pcm) AS BIGINT) AS n FROM s
        ),
        rec(doc_id, t, {state_cols}) AS (
            SELECT doc_id, 0, {init} FROM s
            UNION ALL
            SELECT r.doc_id, r.t + 1, {step}
            FROM rec r JOIN s ON s.doc_id = r.doc_id
            WHERE r.t < len(s.pcm)
        ),
        fin AS (
            SELECT r.*, m.n FROM rec r
            JOIN meta m ON m.doc_id = r.doc_id
            WHERE r.t = m.n
        ),
        pw AS (
            SELECT doc_id, n, {powers} FROM fin f
        )
        SELECT doc_id, n AS n_samples,
               ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
               ROUND(p3, 6) AS p3, ROUND(p4, 6) AS p4,
               ROUND(({fp_sum}) / NULLIF({p_sum}, 0), 9) AS centroid
        FROM pw
    """


@register(
    "q_multimodal_spectral_centroid",
    oracle=_sc_oracle(),
    doc=(
        "Spectral centroid of the raw-PCM audio payloads: FOUR "
        "Goertzel bins (f = 1/16..4/16 cycles/sample) in one O(4N) "
        "fold, centroid = Σ f·P / ΣP — the audio-curation shape "
        "feature splitting tones from noise, composing the wave-39 "
        "single-bin kernel into a spectral descriptor. Parity: all "
        "four 2cos constants and the four f weights are injected "
        "Python literals (no engine evaluates trig), the 8-state "
        "recursion is fixed-order IEEE arithmetic replayed by the "
        "recursive-CTE oracle, NULLIF guards the all-zero-signal "
        "division identically on both engines. Scale: applyInPandas "
        "per document, parallelism = |documents|, state = 8 doubles."
    ),
    tags=("multimodal", "binary", "dsp", "pandas-udf"),
)
def q_multimodal_spectral_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")

    c1, c2, c3, c4 = (_SC_C[k] for k in _SC_BINS)
    f1, f2, f3, f4 = (_SC_F[k] for k in _SC_BINS)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            # scalar locals, no per-sample dict/tuple churn: the dict
            # variant measured 2.4 s of pure Python at sf0.1
            a1 = b1 = a2 = b2 = a3 = b3 = a4 = b4 = 0.0
            n = 0
            for ch in row.text:
                b = ord(ch)
                fx = float(b if b < 128 else b - 256)
                a1, b1 = (fx + c1 * a1) - b1, a1
                a2, b2 = (fx + c2 * a2) - b2, a2
                a3, b3 = (fx + c3 * a3) - b3, a3
                a4, b4 = (fx + c4 * a4) - b4, a4
                n += 1
            p1 = (a1 * a1 + b1 * b1) - c1 * a1 * b1
            p2 = (a2 * a2 + b2 * b2) - c2 * a2 * b2
            p3 = (a3 * a3 + b3 * b3) - c3 * a3 * b3
            p4 = (a4 * a4 + b4 * b4) - c4 * a4 * b4
            psum = p1 + p2 + p3 + p4
            fpsum = f1 * p1 + f2 * p2 + f3 * p3 + f4 * p4
            centroid = fpsum / psum if psum != 0 else None
            out.append((int(row.doc_id), n, p1, p2, p3, p4, centroid))
        return pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "n_samples",
                "p1_raw",
                "p2_raw",
                "p3_raw",
                "p4_raw",
                "centroid_raw",
            ],
        )

    folded = d.repartition(32, "doc_id").mapInPandas(
        lambda it: (kernel(pdf) for pdf in it),
        schema="doc_id bigint, n_samples bigint, p1_raw double,"
        " p2_raw double, p3_raw double, p4_raw double, centroid_raw double",
    )
    return folded.select(
        "doc_id",
        "n_samples",
        F.round("p1_raw", 6).alias("p1"),
        F.round("p2_raw", 6).alias("p2"),
        F.round("p3_raw", 6).alias("p3"),
        F.round("p4_raw", 6).alias("p4"),
        F.round("centroid_raw", 9).alias("centroid"),
    )
