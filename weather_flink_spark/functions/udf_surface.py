"""The engine's custom-code injection surface (SURVEY.md §2-C "UDF surface").

The reference's only injection points are its two serializer classes
(A2/A4 — byte↔row codecs); this module is the general surface a user
of the engine gets, one exemplar per mechanism, ordered by preference:

1. expression composition (NOT a UDF)   — always first choice: Catalyst
   sees through it, codegen applies, 100 TB-safe.
2. ``pandas_udf`` scalar                — Arrow-vectorized, for logic
   that genuinely needs numpy/pandas kernels.
3. ``pandas_udf`` grouped-agg (UDAF)    — custom aggregate over Arrow.
4. ``applyInPandas`` (grouped map)      — per-group reshaping.
5. ``udtf``                             — table function (row → rows).
6. row-at-a-time ``udf``                — last resort, kept only as the
   conformance exemplar; ~10-100× slower than (2) on the hot path.

Spark 4 resolves UDF return types against the active session, so the
wrapped objects are built lazily (cached factories), not at import.
Every exemplar is deterministic so tests can pin exact outputs.
"""

from __future__ import annotations

import math
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. expression composition — the non-UDF default
# ---------------------------------------------------------------------------


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, pure expressions (codegen-friendly)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(6371.0) * 2 * F.asin(F.sqrt(a))


# ---------------------------------------------------------------------------
# 2. pandas UDF (scalar): Arrow-vectorized z-score
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def zscore_clip():
    """(x - mean) / std clipped to ±4 — vectorized over Arrow batches."""

    def kernel(x: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
        z = (x - mean) / std.replace(0.0, float("nan"))
        return z.clip(-4.0, 4.0)

    return F.pandas_udf(kernel, "double")


def _jaro_winkler_py(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Jaro-Winkler similarity, bit-compatible with DuckDB's
    ``jaro_winkler_similarity`` (verified exact on the part-name corpus:
    same match-window, transposition count, and prefix-boost-over-0.7
    arithmetic; empty strings score 0.0 even against themselves)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    sim = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if sim > boost:
        pref = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pref += 1
        sim += pref * p * (1 - sim)
    return sim


@lru_cache(maxsize=1)
def jaro_winkler():
    """Arrow-batched Jaro-Winkler similarity pandas UDF.

    The kernel is per-pair Python (the algorithm is branch-heavy and
    string-length-bounded, not vectorizable with pandas primitives),
    but transfer is columnar Arrow and the operator contract bounds the
    pair space with blocking BEFORE this runs — the same discipline as
    q_fuzzy_match_levenshtein."""

    def kernel(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _jaro_winkler_py(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return F.pandas_udf(kernel, "double")


# ---------------------------------------------------------------------------
# 3. pandas UDF (grouped aggregate): the UDAF analog
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def geometric_mean():
    """Geometric mean of positive values (custom aggregate over Arrow)."""

    def kernel(v: pd.Series) -> float:
        logs = v[v > 0].map(math.log)
        return float(math.exp(logs.mean())) if len(logs) else float("nan")

    return F.pandas_udf(kernel, "double")


# ---------------------------------------------------------------------------
# 4. applyInPandas (grouped map): per-group min-max normalization
# ---------------------------------------------------------------------------

NORMALIZED_SCHEMA = "deviceId string, timestamp long, temperature double, t_norm double"


def normalize_per_device(df: DataFrame) -> DataFrame:
    """Min-max normalize temperature within each device group."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["temperature"].min(), pdf["temperature"].max()
        span = (hi - lo) or 1.0
        return pdf.assign(t_norm=(pdf["temperature"] - lo) / span)[
            ["deviceId", "timestamp", "temperature", "t_norm"]
        ]

    return df.groupBy("deviceId").applyInPandas(norm, schema=NORMALIZED_SCHEMA)


# ---------------------------------------------------------------------------
# 5. UDTF: table function fanning a token string out to (token, pos) rows
# ---------------------------------------------------------------------------


class _ExplodeTokens:
    """Row → rows table function (Spark ≥3.5 Python UDTF)."""

    def eval(self, text: str):
        if text:
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield tok, i


@lru_cache(maxsize=1)
def explode_tokens_udtf():
    return F.udtf(_ExplodeTokens, returnType="token: string, pos: int")


# ---------------------------------------------------------------------------
# 6. row-at-a-time UDF: conformance exemplar only
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def luhn_checksum_row():
    """Luhn check digit for a numeric string — row-at-a-time Python.

    Kept as the slow-path exemplar; anything on a hot path should be
    rewritten as expressions or a pandas UDF.
    """

    def kernel(s: str) -> str | None:
        if s is None or not s.isdigit():
            return None
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                d -= 9 if d > 9 else 0
            total += d
        return str((10 - total % 10) % 10)

    return F.udf(kernel, returnType=T.StringType())
