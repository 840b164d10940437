"""Skew-handling join helper: explicit key salting.

AQE's skew-join split (on in session.py) handles most skew at runtime,
but it only splits SORT-MERGE join partitions post-shuffle. When one
key is pathologically hot (the classic null-key / default-value skew in
a 100 TB fact table), explicit salting bounds the worst task *before*
the shuffle:

- fact side: append a deterministic salt in [0, n) derived from a
  spread column (hash-mod — no rand(), so plans stay reproducible and
  retry-safe; rand() per row breaks task retry determinism);
- dim side: replicate each row n times (one per salt value);
- join on (key, salt): the hot key's rows now land on n partitions.

Replication multiplies the dim side by n — use only when dim ≪ fact,
which is exactly the skew scenario.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    spread_col: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on ``on`` with ``n_salts``-way salting of hot keys.

    ``spread_col``: column whose hash spreads a hot key's rows across
    salts (default: the whole fact row via all columns — deterministic).
    """
    if spread_col is None:
        spread = F.hash(*[F.col(c) for c in fact.columns])
    else:
        spread = F.hash(F.col(spread_col) if isinstance(spread_col, str) else spread_col)
    salted_fact = fact.withColumn(SALT_COL, F.pmod(spread, F.lit(n_salts)))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_dim = dim.withColumn(SALT_COL, salts)
    out = salted_fact.join(salted_dim, [on, SALT_COL], how)
    return out.drop(SALT_COL)
