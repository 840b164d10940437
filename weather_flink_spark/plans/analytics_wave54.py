"""Wave-54 operators (round 8): DTW profile distance, Haar wavelet
decomposition, and ROUGE overlap scoring on LSH candidate pairs.

- ``q_ts_dtw_profile`` — dynamic time warping between every user's
  8-bucket (3-hour) activity profile and the GLOBAL reference profile
  (Berndt & Clifford 1994, the time-series similarity standard that
  tolerates phase shift where L1/cosine cannot). Profiles are
  per-mille integers (``1000·c_k div total`` — truncating division,
  engine-identical), the 8×8 DP is UNROLLED into 64 chained integer
  column expressions (same expression text on both engines: Spark
  withColumn chain, DuckDB lateral column aliases), and the output
  carries dtw_pm, the plain l1_pm, and warp_gain = l1−dtw ≥ 0 (how
  much alignment the warp buys — the identity the test asserts).
  Scale: ONE groupBy to profiles, then 64 integer expressions per
  user row inside whole-stage codegen — no shuffle, no UDF, no
  per-pair work.
- ``q_events_haar_dwt`` — 3-level unnormalized Haar wavelet transform
  of the same per-mille profiles (a=x+y / d=x−y butterflies — pure
  integer, the exact-math discrete wavelet): per user the full
  8-coefficient decomposition + detail_energy = Σ|d| (the burstiness
  summary complementing q_events_seasonality's single ratio).
  Perfect-reconstruction is unit-tested (inverse butterflies recover
  the profile exactly).
- ``q_text_rouge_pairs`` — ROUGE-1/ROUGE-2 overlap scoring of the
  MinHash-LSH candidate pairs (the dedup-audit step: banding proposes,
  ROUGE explains): for each banded pair (a<b, a = reference), unigram
  and bigram SET recalls with integer overlap counts and one final
  double division each. Rides the session-cached band index — the
  candidate set is band-blocked, never doc×doc.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

_N_BUCKETS = 8  # 3-hour buckets


def _profile_exprs(prefix: str, intdiv: str) -> list[str]:
    """Per-mille profile columns p{k} from count columns c{k} and tot
    (``intdiv`` = 'div' Spark, '//' DuckDB — truncating on both)."""
    return [
        f"CAST((1000 * {prefix}c{k}) {intdiv} {prefix}tot AS BIGINT)"
        for k in range(_N_BUCKETS)
    ]


def _dtw_chain() -> list[tuple[str, str]]:
    """The unrolled 8x8 DTW DP as (alias, expression) pairs — each
    expression references only earlier aliases, so the SAME text runs
    as a Spark withColumn chain and a DuckDB lateral-alias SELECT.
    Cost = |p_i - r_j|; classic band-free recurrence."""
    out: list[tuple[str, str]] = []
    for i in range(1, _N_BUCKETS + 1):
        for j in range(1, _N_BUCKETS + 1):
            cost = f"abs(p{i - 1} - r{j - 1})"
            if i == 1 and j == 1:
                rec = cost
            elif i == 1:
                rec = f"d_1_{j - 1} + {cost}"
            elif j == 1:
                rec = f"d_{i - 1}_1 + {cost}"
            else:
                rec = (
                    f"least(d_{i - 1}_{j}, d_{i}_{j - 1},"
                    f" d_{i - 1}_{j - 1}) + {cost}"
                )
            out.append((f"d_{i}_{j}", rec))
    return out


def _counts_sql(col: str) -> list[str]:
    return [
        f"CAST(SUM(CASE WHEN {col} = {k} THEN 1 ELSE 0 END) AS BIGINT)"
        for k in range(_N_BUCKETS)
    ]


def _dtw_oracle() -> str:
    ucnt = ",\n                   ".join(
        f"{e} AS c{k}" for k, e in enumerate(_counts_sql("b"))
    )
    gcnt = ",\n                   ".join(
        f"{e} AS gc{k}" for k, e in enumerate(_counts_sql("b"))
    )
    up = ", ".join(f"{e} AS p{k}" for k, e in enumerate(_profile_exprs("", "//")))
    rp = ", ".join(
        f"CAST((1000 * gc{k}) // gtot AS BIGINT) AS r{k}"
        for k in range(_N_BUCKETS)
    )
    l1 = " + ".join(f"abs(p{k} - r{k})" for k in range(_N_BUCKETS))
    # The DP cells are grouped into anti-diagonal LAYERS of nested
    # subqueries instead of one chained-alias SELECT: DuckDB expands
    # lateral column aliases by textual substitution, so the chained
    # form's d_8_8 tree grows ~3^depth and the optimizer spent a
    # measured 42 s PLANNING the 6.8 KB query (execution was 1.4 s).
    # A subquery boundary makes each cell a real column reference —
    # identical values, ~0.1 s planning (r10). Each anti-diagonal
    # references only cells from strictly earlier diagonals, so the
    # layering is exactly the DP's data-flow order.
    cells = dict()
    for a, e in _dtw_chain():
        _, i, j = a.split("_")
        cells[(int(i), int(j))] = (a, e)
    inner = f"SELECT user_id, {up}, {rp} FROM u CROSS JOIN g"
    for s in range(2, 2 * _N_BUCKETS + 1):
        layer = [
            cells[(i, s - i)]
            for i in range(1, _N_BUCKETS + 1)
            if 1 <= s - i <= _N_BUCKETS
        ]
        exprs = ", ".join(f"{e} AS {a}" for a, e in layer)
        inner = f"SELECT *, {exprs} FROM ({inner})"
    return f"""
        WITH b AS (
            SELECT user_id, hour(ts) // 3 AS b FROM events
        ),
        u AS (
            SELECT user_id,
                   {ucnt},
                   CAST(COUNT(*) AS BIGINT) AS tot
            FROM b GROUP BY user_id
        ),
        g AS (
            SELECT {gcnt},
                   CAST(COUNT(*) AS BIGINT) AS gtot
            FROM b
        ),
        prof AS ({inner})
        SELECT user_id,
               d_{_N_BUCKETS}_{_N_BUCKETS} AS dtw_pm,
               {l1} AS l1_pm,
               ({l1}) - d_{_N_BUCKETS}_{_N_BUCKETS} AS warp_gain
        FROM prof
    """


def _drop_cells(df: DataFrame) -> DataFrame:
    keep = ["user_id", "dtw_pm", "l1_pm", "warp_gain"]
    return df.select(*keep)


@register(
    "q_ts_dtw_profile",
    oracle=f"""
        WITH dtw_full AS ({_dtw_oracle()})
        SELECT user_id, dtw_pm, l1_pm, warp_gain FROM dtw_full
    """,
    doc=(
        "Dynamic time warping (Berndt-Clifford 1994) between each "
        "user's 8-bucket per-mille activity profile and the global "
        "reference: the 8x8 DP unrolled into 64 chained integer "
        "expressions (identical text on both engines — Spark "
        "withColumn chain, DuckDB lateral aliases), truncating-div "
        "per-mille normalization, |.| cost. Output dtw_pm <= l1_pm "
        "with warp_gain = what alignment buys (>= 0, tested). Scale: "
        "one groupBy to profiles + branch-free integer codegen per "
        "row; no shuffle beyond the profile build, no UDF, no "
        "per-pair work (reference is ONE broadcast row)."
    ),
    tags=("timeseries", "events", "similarity", "analytics"),
)
def q_ts_dtw_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = e.select("user_id", F.expr("hour(ts) div 3").alias("b"))
    u = b.groupBy("user_id").agg(
        *[
            F.expr(expr).alias(f"c{k}")
            for k, expr in enumerate(_counts_sql("b"))
        ],
        F.count("*").cast("bigint").alias("tot"),
    )
    g = b.agg(
        *[
            F.expr(expr).alias(f"gc{k}")
            for k, expr in enumerate(_counts_sql("b"))
        ],
        F.count("*").cast("bigint").alias("gtot"),
    )
    prof = u.crossJoin(F.broadcast(g)).select(
        "user_id",
        *[
            F.expr(e_).alias(f"p{k}")
            for k, e_ in enumerate(_profile_exprs("", "div"))
        ],
        *[
            F.expr(f"CAST((1000 * gc{k}) div gtot AS BIGINT)").alias(f"r{k}")
            for k in range(_N_BUCKETS)
        ],
    )
    for alias, expr in _dtw_chain():
        # Spark div vs SQL //: the chain itself is div-free (abs/least/+)
        prof = prof.withColumn(alias, F.expr(expr))
    l1 = " + ".join(f"abs(p{k} - r{k})" for k in range(_N_BUCKETS))
    return _drop_cells(
        prof.withColumn(
            "dtw_pm", F.col(f"d_{_N_BUCKETS}_{_N_BUCKETS}")
        )
        .withColumn("l1_pm", F.expr(l1))
        .withColumn(
            "warp_gain", F.col("l1_pm") - F.col("dtw_pm")
        )
    )


# ---------------------------------------------------------------------------
# Haar discrete wavelet transform of the activity profile
# ---------------------------------------------------------------------------


def _haar_defs() -> list[tuple[str, str]]:
    out = []
    for k in range(4):  # level 1 butterflies over p0..p7
        out.append((f"a1_{k}", f"p{2 * k} + p{2 * k + 1}"))
        out.append((f"d1_{k}", f"p{2 * k} - p{2 * k + 1}"))
    for k in range(2):  # level 2
        out.append((f"a2_{k}", f"a1_{2 * k} + a1_{2 * k + 1}"))
        out.append((f"d2_{k}", f"a1_{2 * k} - a1_{2 * k + 1}"))
    out.append(("a3", "a2_0 + a2_1"))
    out.append(("d3", "a2_0 - a2_1"))
    out.append(
        (
            "detail_energy",
            "abs(d1_0) + abs(d1_1) + abs(d1_2) + abs(d1_3)"
            " + abs(d2_0) + abs(d2_1) + abs(d3)",
        )
    )
    return out


_HAAR_OUT = ["a3", "d3", "d2_0", "d2_1", "d1_0", "d1_1", "d1_2", "d1_3", "detail_energy"]


def _haar_oracle() -> str:
    ucnt = ",\n                   ".join(
        f"{e} AS c{k}" for k, e in enumerate(_counts_sql("b"))
    )
    up = ", ".join(f"{e} AS p{k}" for k, e in enumerate(_profile_exprs("", "//")))
    chain = ",\n               ".join(f"{e} AS {a}" for a, e in _haar_defs())
    return f"""
        WITH b AS (
            SELECT user_id, hour(ts) // 3 AS b FROM events
        ),
        u AS (
            SELECT user_id,
                   {ucnt},
                   CAST(COUNT(*) AS BIGINT) AS tot
            FROM b GROUP BY user_id
        ),
        prof AS (SELECT user_id, {up} FROM u)
        SELECT user_id, {chain}
        FROM prof
    """


@register(
    "q_events_haar_dwt",
    oracle=f"""
        WITH h AS ({_haar_oracle()})
        SELECT user_id, {", ".join(_HAAR_OUT)} FROM h
    """,
    doc=(
        "3-level unnormalized Haar discrete wavelet transform of each "
        "user's 8-bucket per-mille activity profile: a=x+y / d=x-y "
        "butterflies — pure integer, perfect reconstruction "
        "(unit-tested inverse). Output: the full coefficient set "
        "(a3 = profile mass, d3/d2/d1 = coarse-to-fine contrasts) + "
        "detail_energy = Σ|d|, the multi-resolution burstiness "
        "summary complementing q_events_seasonality. Scale: one "
        "groupBy + branch-free integer expressions in codegen."
    ),
    tags=("timeseries", "events", "wavelet", "analytics"),
)
def q_events_haar_dwt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    b = e.select("user_id", F.expr("hour(ts) div 3").alias("b"))
    u = b.groupBy("user_id").agg(
        *[
            F.expr(expr).alias(f"c{k}")
            for k, expr in enumerate(_counts_sql("b"))
        ],
        F.count("*").cast("bigint").alias("tot"),
    )
    prof = u.select(
        "user_id",
        *[
            F.expr(e_).alias(f"p{k}")
            for k, e_ in enumerate(_profile_exprs("", "div"))
        ],
    )
    for alias, expr in _haar_defs():
        prof = prof.withColumn(alias, F.expr(expr))
    return prof.select("user_id", *_HAAR_OUT)


# ---------------------------------------------------------------------------
# ROUGE overlap on LSH candidate pairs
# ---------------------------------------------------------------------------


def _rouge_oracle() -> str:
    from weather_flink_spark.plans.llm_pipeline import _BANDS_SQL

    return f"""
        WITH bands AS MATERIALIZED ({_BANDS_SQL}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a
            JOIN bands b
              ON b.band_id = a.band_id AND b.band_key = a.band_key
             AND b.doc_id > a.doc_id
        ),
        gram AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(tok) AS uni,
                   list_distinct(list_transform(
                       range(1, greatest(len(tok), 1)),
                       i -> tok[i] || ' ' || tok[i + 1])) AS big
            FROM (SELECT doc_id, string_split(text, ' ') AS tok
                  FROM documents)
        )
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(x.uni, y.uni)) AS BIGINT) AS n_uni,
               CAST(len(list_intersect(x.big, y.big)) AS BIGINT) AS n_big,
               ROUND(CAST(len(list_intersect(x.uni, y.uni)) AS DOUBLE)
                     / NULLIF(len(x.uni), 0), 6) AS rouge1_recall,
               ROUND(CAST(len(list_intersect(x.big, y.big)) AS DOUBLE)
                     / NULLIF(len(x.big), 0), 6) AS rouge2_recall
        FROM cand c
        JOIN gram x ON x.doc_id = c.id_a
        JOIN gram y ON y.doc_id = c.id_b
    """


@register(
    "q_text_rouge_pairs",
    oracle=_rouge_oracle(),
    doc=(
        "ROUGE-1/ROUGE-2 set recall over the MinHash-LSH candidate "
        "pairs (a<b, a = reference) — the dedup-AUDIT step: banding "
        "proposes candidates, ROUGE explains the overlap in the "
        "n-gram terms a human reviews. Rides the session-cached band "
        "index (candidates are band-blocked, never doc x doc); "
        "integer intersection counts, one double division per score, "
        "NULLIF-guarded. Scale: band equi-join + two doc-keyed gram "
        "joins — the q_dedup_incremental shape with a different "
        "verifier."
    ),
    tags=("text", "dedup", "evaluation", "llm-pipeline"),
)
def q_text_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_pipeline import minhash_bands

    bands = minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.band_id") == F.col("a.band_id"))
            & (F.col("b.band_key") == F.col("a.band_key"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tok")
    )
    gram = d.select(
        "doc_id",
        F.array_distinct("tok").alias("uni"),
        F.array_distinct(
            # Spark sequence(1, 0) counts DOWN ([1, 0]) — guard the
            # single-token doc instead of relying on an empty range
            F.expr(
                "CASE WHEN size(tok) < 2"
                " THEN cast(array() as array<string>)"
                " ELSE transform(sequence(1, size(tok) - 1),"
                " i -> concat(tok[i - 1], ' ', tok[i])) END"
            )
        ).alias("big"),
    )
    n_uni = F.size(F.array_intersect(F.col("x.uni"), F.col("y.uni")))
    n_big = F.size(F.array_intersect(F.col("x.big"), F.col("y.big")))
    return (
        cand.join(gram.alias("x"), F.col("x.doc_id") == F.col("id_a"))
        .join(gram.alias("y"), F.col("y.doc_id") == F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            n_uni.cast("bigint").alias("n_uni"),
            n_big.cast("bigint").alias("n_big"),
            F.round(
                n_uni.cast("double")
                / F.nullif(F.size(F.col("x.uni")).cast("double"), F.lit(0.0)),
                6,
            ).alias("rouge1_recall"),
            F.round(
                n_big.cast("double")
                / F.nullif(F.size(F.col("x.big")).cast("double"), F.lit(0.0)),
                6,
            ).alias("rouge2_recall"),
        )
    )
