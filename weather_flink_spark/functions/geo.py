"""Geohash encoding as pure Catalyst expressions (no UDF).

Geohash interleaves the bits of quantized latitude/longitude and
base32-encodes the result.  Both halves are exact integer arithmetic
once the single quantization ``floor`` runs, so Spark and DuckDB
produce byte-identical hashes: the same generator emits the 40-term
bit-interleave as a Spark Column tree and as a DuckDB SQL string.

Precision is fixed at 8 characters (40 bits = 20 lat + 20 lon bits,
cell ~19m x 38m); coarser buckets are string prefixes — ``substr(gh,
1, 3)`` is the ~156 km cell used for spatial bucketing, which is the
whole point at scale: the bucket key turns a spatial join into a
shuffle-on-string equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_BITS = 20  # per axis; 2*_BITS = 40 bits = 8 base32 chars
_SCALE = float(1 << _BITS)
_CHAR_SHIFTS = [35, 30, 25, 20, 15, 10, 5, 0]


def _quant(value: Column, offset: float, span: float) -> Column:
    q = F.floor((value + F.lit(offset)) / F.lit(span) * F.lit(_SCALE))
    return F.least(F.lit((1 << _BITS) - 1), F.greatest(F.lit(0), q)).cast("long")


def geohash8(lat: Column, lon: Column) -> Column:
    """8-char geohash of (lat, lon) as a single expression tree.

    40 shift/and/multiply terms + 8 substr lookups — all inside
    whole-stage codegen, no Python in the loop.
    """
    lat_i = _quant(lat, 90.0, 180.0)
    lon_i = _quant(lon, 180.0, 360.0)
    v: Column = F.lit(0).cast("long")
    for k in range(_BITS):
        v = v + F.shiftright(lon_i, _BITS - 1 - k).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * _BITS - 1 - 2 * k)
        )
        v = v + F.shiftright(lat_i, _BITS - 1 - k).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * _BITS - 2 - 2 * k)
        )
    chars = [
        F.lit(GEOHASH_ALPHABET).substr(
            (F.shiftright(v, s).bitwiseAND(F.lit(31)) + 1).cast("int"), F.lit(1)
        )
        for s in _CHAR_SHIFTS
    ]
    return F.concat(*chars)


def geohash8_select_sql(src_sql: str, keep_cols: str, lat: str, lon: str) -> str:
    """The same encoding as a DuckDB SQL relation: wraps ``src_sql``
    (a SELECT producing ``lat``/``lon``) and yields ``keep_cols`` plus
    ``gh8``.

    Generated from the same constants as :func:`geohash8`, so the two
    engines agree byte-for-byte (the only float op is the quantization
    ``floor``, identical IEEE arithmetic on both).  Nested subqueries
    keep each intermediate (quantized ints, interleaved bits) computed
    once instead of inlining it 320 times.
    """
    top = (1 << _BITS) - 1
    lat_i = (
        f"LEAST({top}, GREATEST(0, CAST(FLOOR(({lat} + 90.0) / 180.0 "
        f"* {_SCALE!r}) AS BIGINT)))"
    )
    lon_i = (
        f"LEAST({top}, GREATEST(0, CAST(FLOOR(({lon} + 180.0) / 360.0 "
        f"* {_SCALE!r}) AS BIGINT)))"
    )
    terms = []
    for k in range(_BITS):
        terms.append(
            f"(((__lon_i >> {_BITS - 1 - k}) & 1) * {1 << (2 * _BITS - 1 - 2 * k)})"
        )
        terms.append(
            f"(((__lat_i >> {_BITS - 1 - k}) & 1) * {1 << (2 * _BITS - 2 - 2 * k)})"
        )
    vbits = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(((__v >> {s}) & 31) AS INTEGER) + 1, 1)"
        for s in _CHAR_SHIFTS
    )
    return f"""
        SELECT {keep_cols}, {chars} AS gh8
        FROM (
            SELECT {keep_cols}, {vbits} AS __v
            FROM (
                SELECT {keep_cols}, {lat_i} AS __lat_i, {lon_i} AS __lon_i
                FROM ({src_sql})
            )
        )
    """
