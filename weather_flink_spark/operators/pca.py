"""Distributed PCA over an embedding column (scale path: Gramian rollup).

The 100 TB shape: X is n×d with n huge and d small (64 here). The only
thing that must be distributed is the Gramian/mean accumulation — d²+d
numbers per partition — after which the eigenproblem is a driver-side
O(d³) solve on a 64×64 matrix. That is the classic tree-aggregate PCA
(same shape Spark MLlib's ``RowMatrix.computePrincipalComponents``
uses); we build it on mapInPandas + an element-wise distributed sum so
nothing driver-side ever scales with n:

1. per-partition numpy partials: (count, Σx, Σxᵀx) — one row each,
   Arrow-batched, map-side only;
2. element-wise reduction of the partials via posexplode + groupBy(pos)
   — the shuffle is ≤ partitions×(d²+d) rows, independent of n;
3. driver collects exactly d²+d+1 numbers, forms the covariance,
   ``numpy.linalg.eigh``, fixes each eigenvector's sign (largest-|.|
   component made positive — eigenvectors are only defined up to sign);
4. projection back on the cluster as a pure JVM expression
   (zip_with + aggregate over literal component arrays), so the scoring
   pass is whole-stage-codegen, no Python in the hot path.

The reference engine has no linear-algebra surface at all (its plan
body is empty — WeatherProcessingJobPlan.java:9-11); this exists for
the training-data-pipeline side of SURVEY.md §2 (embedding column ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        # acc = [n | Σx (d) | ΣxᵀX flat (d²)] — count rides the array so
        # the reduction (and the single data pass feeding it) happens once
        T.StructField("acc", T.ArrayType(T.DoubleType())),
    ]
)


def gramian_stats(df: DataFrame, col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed (count, Σx, ΣxᵀX) for an array<float> column.

    Driver memory is O(d²) regardless of row count; the reduction of
    per-partition partials happens on the cluster (groupBy over element
    position), not by collecting partials.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"acc": [np.concatenate([[float(n)], s, g.ravel()])]}
            )

    part = df.select(F.col(col).alias(col)).mapInPandas(partials, schema=_PARTIAL_SCHEMA)
    # element-wise distributed sum: ≤ P×(d²+d+1) rows shuffled, O(d²) out;
    # one data pass — the row count is slot 0 of the same reduction.
    # The cross-partition reduction goes through exact DECIMAL so the
    # Gramian (and everything the eigensolve derives from it) does not
    # depend on partition arrival order — the model is reproducible
    # across cluster configurations.
    reduced = (
        part.select(F.posexplode("acc").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("v").cast("decimal(38,18)")).cast("double").alias("v"))
        .collect()
    )
    acc = np.zeros(1 + dim + dim * dim)
    for r in reduced:
        acc[r["pos"]] = r["v"]
    n_total = int(round(acc[0]))
    return n_total, acc[1 : 1 + dim], acc[1 + dim :].reshape(dim, dim)


def fit_pca(df: DataFrame, col: str, dim: int, k: int) -> dict:
    """Top-k principal components from the distributed Gramian."""
    n, s, g = gramian_stats(df, col, dim)
    if n < 2:
        raise ValueError("need at least 2 rows to fit PCA")
    mean = s / n
    # covariance from the Gramian: (ΣxᵀX − n·μμᵀ) / (n−1)
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # k×d
    # sign canon: largest-|.| coordinate of each component made positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    var = w[order]
    total_var = float(np.clip(w.sum(), 1e-300, None))
    return {
        "n": n,
        "mean": mean,
        "components": comps,
        "explained_variance": var,
        "explained_ratio": var / total_var,
    }


def project(df: DataFrame, col: str, model: dict, prefix: str = "pc") -> DataFrame:
    """Score rows against a fitted model — pure JVM expression path.

    Each projection is aggregate(zip_with(x−μ, component, *), +): stays
    inside whole-stage codegen, no Python UDF in the n-scaled pass.
    """
    mean = [float(x) for x in model["mean"]]
    out = df
    for i, comp in enumerate(model["components"]):
        comp_lit = F.array(*[F.lit(float(c)) for c in comp])
        mean_lit = F.array(*[F.lit(m) for m in mean])
        centered = F.zip_with(F.col(col).cast("array<double>"), mean_lit, lambda a, b: a - b)
        prod = F.zip_with(centered, comp_lit, lambda a, b: a * b)
        out = out.withColumn(
            f"{prefix}{i + 1}",
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x),
        )
    return out


# ---------------------------------------------------------------------------
# Oracle-replayable PCA: quantized covariance + power iteration + deflation
# ---------------------------------------------------------------------------
#
# The eigh path above is the fastest route to components, but its
# eigensolve is not SQL-expressible, so queries built on it can only be
# rows-only-checked.  This second path trades the LAPACK solve for
# T-step power iteration with deflation, engineered so a DuckDB oracle
# replays it BIT-EXACTLY:
#
# * inputs snap to decimal grids (components 6dp, covariance/mean 9dp);
#   a decimal(18,9)-grid double converts exactly between engines;
# * every subsequent arithmetic step is plain IEEE-754 binary64 with a
#   FIXED operation order (sequential left folds), so Python-float math
#   on the driver and DuckDB's list_reduce produce identical bits —
#   the same discipline the LTTB/Holt recursive-CTE oracles use;
# * the only distributed work is the exact integer Gramian (below);
#   the d×d iteration is O(k·T·d²) scalar flops — driver-trivial and
#   INDEPENDENT of n, so the split (cluster: one data pass; driver:
#   model solve; cluster: codegen projection) holds at 100 TB.
#
# Convergence: per step the error shrinks by λ₂/λ₁ (per deflated
# component); the synthetic embeddings have ratios ≈ 0.96–0.99, so
# T = 600 leaves ≤ (0.99)^600 ≈ 2e-3 residual mixing — components match
# numpy eigh to |cos| ≈ 1 (tests/test_pca.py pins this).

PCA_POWER_ITERS = 600
_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("v", T.DecimalType(38, 0)),
    ]
)


def quantize_embeddings(df: DataFrame, col: str, dim: int) -> DataFrame:
    """6dp-quantized copy of an array<float> column as array<decimal(10,6)>.

    ROUND(CAST(x AS DOUBLE), 6) → DECIMAL is the measured-safe
    float→decimal route (direct FLOAT→DECIMAL casts disagree between
    engines on ~0.5% of values); a (10,6) decimal converts back to
    double exactly (scaled int < 2^53), so everything downstream of
    this snap is engine-independent.
    """
    return df.withColumn(
        col,
        F.transform(F.col(col), lambda x: F.round(x.cast("double"), 6).cast("decimal(10,6)")),
    )


def exact_gramian(df_q: DataFrame, col: str, dim: int) -> tuple[int, list[int], list[int]]:
    """Exact integer (n, Σx·1e6, Σxᵀx·1e12) over a quantized column.

    Per-partition mapInPandas partial: the 6dp decimals become
    int64s scaled 1e6; chunk Gramians are exact int64 matmuls
    (chunk_rows × (1e6·|x|max)² ≪ 2^63) accumulated into arbitrary-
    precision Python ints, so partition boundaries can NEVER perturb
    the result — the model is bit-reproducible across any cluster
    partitioning, unlike a float Gramian.  Each partition emits
    1+d+d² decimal(38,0) rows; the cross-partition reduction is an
    exact decimal SUM keyed by position (≤ partitions·(d²+d+1) rows
    shuffled, independent of n).
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from decimal import Decimal

        n = 0
        t_acc: list[int] = [0] * dim
        g_acc: list[int] = [0] * (dim * dim)
        for b in batches:
            if not len(b):
                continue
            xi = np.array(
                [[int(d.scaleb(6)) for d in row] for row in b[col]], dtype=np.int64
            )
            # int64 matmul overflow guard: a Gramian entry is a sum of
            # rows products each ≤ (1e6·|x|max)²; decimal(10,6) admits
            # |x| up to 1e4 (scaled 1e10, squared 1e20 ≫ 2^63), so a
            # silent wraparound is possible on adversarial data. Chunk
            # so chunk_rows · max² stays below 2^62 and raise if even a
            # single row's square overflows — exactness must fail loud.
            amax = int(np.abs(xi).max()) if xi.size else 0
            if amax and amax * amax >= 2**62:
                raise OverflowError(
                    f"quantized |x|max={amax} (scaled 1e6) squares past "
                    "2^62; exact int64 Gramian cannot be guaranteed"
                )
            n += xi.shape[0]
            tc = xi.sum(axis=0, dtype=np.int64).tolist()
            max_rows = (2**62) // (amax * amax) if amax else xi.shape[0]
            if xi.shape[0] <= max_rows:
                gc = (xi.T @ xi).ravel().tolist()
            else:
                g64 = [0] * (dim * dim)
                for s in range(0, xi.shape[0], max_rows):
                    cc = xi[s : s + max_rows]
                    g64 = [a + c for a, c in zip(g64, (cc.T @ cc).ravel().tolist())]
                gc = g64
            t_acc = [a + c for a, c in zip(t_acc, tc)]
            g_acc = [a + c for a, c in zip(g_acc, gc)]
        if n:
            yield pd.DataFrame(
                {
                    "pos": range(dim * dim + dim + 1),
                    "v": [Decimal(n)] + [Decimal(x) for x in t_acc] + [Decimal(x) for x in g_acc],
                }
            )

    reduced = (
        df_q.select(col)
        .mapInPandas(partials, schema=_GRAM_SCHEMA)
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    acc = [0] * (dim * dim + dim + 1)
    for r in reduced:
        acc[r["pos"]] = int(r["v"])
    return acc[0], acc[1 : 1 + dim], acc[1 + dim :]


def _round_half_up9(x: float) -> float:
    """HALF_UP rounding of a double's exact decimal expansion to 9dp —
    the Python twin of DuckDB's ROUND(double, 9)::DECIMAL(18,9) grid
    snap (verified bit-identical over every cov/mean entry in tests)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))


def fit_pca_power(df_q: DataFrame, col: str, dim: int, k: int, iters: int = PCA_POWER_ITERS) -> dict:
    """Top-k components by deflated power iteration on the 9dp-grid
    covariance; every float op mirrors the DuckDB oracle's fold order.

    numpy is used only in shapes whose per-element operation sequence
    equals the scalar loop: the mat-vec accumulates column-by-column in
    ascending j (w += C[:,j]·v[j]), elementwise ops carry one rounding
    each, and no BLAS dot/FMA path is involved.
    """
    n, t_ints, s_ints = exact_gramian(df_q, col, dim)
    if n < 2:
        raise ValueError("need at least 2 rows to fit PCA")
    # doubles exactly as DuckDB derives them: CAST(decimal AS DOUBLE) is
    # (double)int / (double)10^scale — mirrored here as float(int)/1eS
    t = [float(v) / 1e6 for v in t_ints]
    cov = np.empty((dim, dim), dtype=np.float64)
    for i in range(dim):
        ti = t[i]
        for j in range(dim):
            raw = (float(s_ints[i * dim + j]) / 1e12 - ti * t[j] / n) / (n - 1)
            cov[i, j] = _round_half_up9(raw)
    mean = [_round_half_up9(x / n) for x in t]

    def matvec(m: np.ndarray, v: np.ndarray) -> np.ndarray:
        w = np.zeros(dim, dtype=np.float64)
        for j in range(dim):  # ascending-j accumulation == the SQL fold
            w = w + m[:, j] * v[j]
        return w

    comps: list[list[float]] = []
    lams: list[float] = []
    m = cov.copy()
    for _ in range(k):
        v = np.ones(dim, dtype=np.float64)
        for _t in range(iters):
            w = matvec(m, v)
            ss = 0.0
            for i in range(dim):
                ss = ss + float(w[i]) * float(w[i])
            v = w / np.float64(np.sqrt(ss))
        w = matvec(m, v)
        lam = 0.0
        for i in range(dim):
            lam = lam + float(v[i]) * float(w[i])
        # deflate with the raw (pre-sign-canon) vector, like the oracle
        m = m - (np.float64(lam) * v)[:, None] * v[None, :]
        # sign canon: first coordinate attaining max |v| made positive
        mx = float(np.max(np.abs(v)))
        jstar = next(i for i in range(dim) if abs(float(v[i])) == mx)
        vc = (-v if float(v[jstar]) < 0 else v).tolist()
        comps.append([float(x) for x in vc])
        lams.append(float(lam))
    return {"n": n, "mean": mean, "components": comps, "lambdas": lams}


def project_power(df_q: DataFrame, col: str, model: dict, dim: int, prefix: str = "pc") -> DataFrame:
    """Score quantized rows against a power-fit model — JVM fold path.

    pc_c = ROUND(fold_i((x_i − μ_i)·v_i), 9): sequential ascending-i
    fold, whole-stage codegen, literals carry the driver bits exactly
    (Py4J transports doubles by shortest round-trip repr).
    """
    out = df_q
    for c_idx, comp in enumerate(model["components"]):
        comp_lit = F.array(*[F.lit(float(x)) for x in comp])
        mean_lit = F.array(*[F.lit(float(x)) for x in model["mean"]])
        fold = F.aggregate(
            F.sequence(F.lit(1), F.lit(dim)),
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.element_at(F.col(col), i.cast("int")).cast("double")
                - F.element_at(mean_lit, i.cast("int"))
            )
            * F.element_at(comp_lit, i.cast("int")),
        )
        out = out.withColumn(f"{prefix}{c_idx + 1}", F.round(fold, 9))
    return out


def pca_power_cte_parts(dim: int, k: int, iters: int = PCA_POWER_ITERS, table: str = "embeddings", emb_col: str = "embedding") -> list[str]:
    """The shared CTE chain replaying quantize → exact sums → grid
    covariance → recursive power iteration with deflation: produces
    ``xq`` (vec_id, label?, e quantized decimals), ``mu`` (grid means)
    and ``vc0``..``vc{k-1}`` (sign-canonical component DOUBLE[]s).
    Extracted (round 6) so the OPQ oracle can compose the identical
    component replay under its Householder chain without duplicating
    the text — the two oracles can never drift apart."""
    rng = f"range(1, {dim + 1})"

    def mv(mat: str, vec: str) -> str:
        return (
            f"list_transform({rng}, i -> list_reduce(list_prepend(0.0, "
            f"list_transform({rng}, j -> {mat}[i][j] * {vec}[j])), (a, b) -> a + b))"
        )

    ones = "[" + ", ".join(["1.0"] * dim) + "]"
    parts = [
        f"""xq AS MATERIALIZED (
            SELECT vec_id, label,
                   list_transform({emb_col}, x -> CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(10,6))) AS e
            FROM {table}
        )""",
        f"""tn AS MATERIALIZED (
            SELECT LIST(t ORDER BY pos) AS t, MAX(nn) AS n FROM (
                SELECT pos, CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS t, COUNT(*) AS nn
                FROM (SELECT UNNEST({rng}) AS pos, UNNEST(e) AS v FROM xq)
                GROUP BY pos
            )
        )""",
        f"""cov0 AS MATERIALIZED (
            SELECT LIST(row ORDER BY i) AS m FROM (
                SELECT i, LIST(c ORDER BY j) AS row FROM (
                    SELECT i.pos AS i, j.pos AS j,
                           CAST(CAST(ROUND((CAST(SUM(CAST(i.v AS DECIMAL(12,6)) * CAST(j.v AS DECIMAL(12,6))) AS DOUBLE)
                                - tn.t[i.pos] * tn.t[j.pos] / tn.n) / (tn.n - 1), 9) AS DECIMAL(18,9)) AS DOUBLE) AS c
                    FROM (SELECT vec_id, UNNEST({rng}) AS pos, UNNEST(e) AS v FROM xq) i
                    JOIN (SELECT vec_id, UNNEST({rng}) AS pos, UNNEST(e) AS v FROM xq) j USING (vec_id)
                    CROSS JOIN tn
                    GROUP BY i.pos, j.pos, tn.t, tn.n
                ) GROUP BY i
            )
        )""",
        """mu AS MATERIALIZED (
            SELECT list_transform(t, x -> CAST(CAST(ROUND(x / n, 9) AS DECIMAL(18,9)) AS DOUBLE)) AS mu FROM tn
        )""",
    ]
    prev = "cov0"
    for c in range(k):
        parts.append(
            f"""pw{c} AS (
                SELECT 0 AS t, {ones}::DOUBLE[] AS v
                UNION ALL
                SELECT t + 1, list_transform(w, x -> x / sqrt(
                    list_reduce(list_prepend(0.0, list_transform(w, y -> y * y)), (a, b) -> a + b)))
                FROM (SELECT t, {mv('m.m', f'pw{c}.v')} AS w FROM pw{c}, {prev} m WHERE t < {iters})
            )"""
        )
        parts.append(f"vraw{c} AS MATERIALIZED (SELECT v FROM pw{c} WHERE t = {iters})")
        parts.append(
            f"""lam{c} AS MATERIALIZED (
                SELECT list_reduce(list_prepend(0.0, list_transform({rng}, i -> t0.v[i] * t0.w[i])), (a, b) -> a + b) AS lam
                FROM (SELECT vr.v AS v, {mv('m.m', 'vr.v')} AS w FROM vraw{c} vr, {prev} m) t0
            )"""
        )
        parts.append(
            f"""vc{c} AS MATERIALIZED (
                SELECT CASE WHEN v[list_position(list_transform(v, x -> abs(x)),
                                 list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
                                             (a, b) -> CASE WHEN b > a THEN b ELSE a END))] < 0
                            THEN list_transform(v, x -> -x) ELSE v END AS v
                FROM vraw{c}
            )"""
        )
        if c < k - 1:
            parts.append(
                f"""def{c} AS MATERIALIZED (
                    SELECT list_transform({rng}, i -> list_transform({rng}, j ->
                        m.m[i][j] - l.lam * vr.v[i] * vr.v[j])) AS m
                    FROM {prev} m, lam{c} l, vraw{c} vr
                )"""
            )
            prev = f"def{c}"
    return parts


def pca_power_oracle_sql(dim: int, k: int, iters: int = PCA_POWER_ITERS, table: str = "embeddings", emb_col: str = "embedding") -> str:
    """DuckDB replay of quantize → exact sums → grid covariance →
    recursive-CTE power iteration with deflation → projection.

    Mirrors fit_pca_power/project_power operation for operation; the
    iteration runs as one recursive CTE per component (T rows of a
    64-double list), every multiply-referenced stage MATERIALIZED.
    """
    rng = f"range(1, {dim + 1})"
    parts = pca_power_cte_parts(dim, k, iters, table, emb_col)
    projs = ", ".join(
        f"""ROUND(list_reduce(list_prepend(0.0, list_transform({rng},
            i -> (CAST(xq.e[i] AS DOUBLE) - mu.mu[i]) * vc{c}.v[i])), (a, b) -> a + b), 9) AS pc{c + 1}"""
        for c in range(k)
    )
    crosses = " ".join(f"CROSS JOIN vc{c}" for c in range(k))
    return (
        "WITH RECURSIVE "
        + ", ".join(parts)
        + f" SELECT xq.vec_id, xq.label, {projs} FROM xq CROSS JOIN mu {crosses}"
    )
