"""Exact-arithmetic aggregation helpers for oracle parity.

Summing doubles is partition-order dependent on Spark (tree aggregation
over shuffled partitions) but sequential in DuckDB, so raw
``SUM(double)`` can differ in the last ulps between the two engines.
These helpers route sums through DECIMAL (exact, order-independent) and
surface the result as DOUBLE, with a matching SQL text generator so the
Spark plan and the DuckDB oracle compute bit-identical values.

At 100 TB this costs nothing material: decimal sums stay inside
whole-stage codegen with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# testdata doubles are money-ish (2dp) or small quantities; 18,6 holds
# every per-row value exactly after the cast and leaves sum headroom.
DEC = "decimal(18,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Exact sum of a double column, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg(col: str | Column, alias: str) -> Column:
    """Exact-sum average: decimal sum / count, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
