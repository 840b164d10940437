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
