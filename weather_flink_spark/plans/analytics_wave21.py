"""Wave-21 operators (round 4): AR(2) model fitting, PMI collocations,
and dataset fingerprinting.

- ``q_events_ar2_fit`` — Yule-Walker AR(2) fit per event type over the
  dense hourly count series: lag-1/lag-2 Pearson autocorrelations from
  integer-exact moment sums, then the closed-form phi1/phi2 — the
  model-selection step between the ACF diagnostic (q_events_acf) and
  the Holt forecasters.
- ``q_text_pmi_bigrams`` — pointwise mutual information over corpus
  word bigrams (collocation mining): pmi = ln(c_xy * N / (c_x * c_y))
  for bigrams above a support floor — the classic phrase detector
  (word2vec's phrase pass, NLTK collocations).
- ``q_dataset_fingerprint`` — content-addressed dataset fingerprints:
  per table, row count plus order-insensitive BIT_XOR digests of row
  content and of the key column — the cheap equality certificate a
  pipeline stores to prove "this rebuild produced byte-identical data"
  or to detect drift between environments.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); these extend the north-star
surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Yule-Walker AR(2) fit over dense hourly counts
# ---------------------------------------------------------------------------


def _ar2_acf_cte(lag: int) -> str:
    """Integer-exact Pearson autocorrelation at ``lag`` per event type
    over the dense series (the q_events_acf moment discipline)."""
    return f"""
        SELECT a.event_type AS event_type, COUNT(*) AS n,
               SUM(a.c) AS sx, SUM(b.c) AS sy,
               SUM(a.c * b.c) AS sxy,
               SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy
        FROM dense a JOIN dense b
          ON b.event_type = a.event_type AND b.hr = a.hr + {lag}
        GROUP BY a.event_type
    """


_AR2_R = (
    "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
    "    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)"
)


@register(
    "q_events_ar2_fit",
    oracle=f"""
        WITH hc AS (
            SELECT event_type,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS h0,
                   MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) AS h1
            FROM events
        ),
        dense AS (
            SELECT t.event_type, g.hr, COALESCE(hc.cnt, 0) AS c
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT UNNEST(range(h0, h1 + 1)) AS hr FROM bounds) g
            LEFT JOIN hc ON hc.event_type = t.event_type AND hc.hr = g.hr
        ),
        m1 AS ({_ar2_acf_cte(1)}),
        m2 AS ({_ar2_acf_cte(2)}),
        r AS (
            SELECT m1.event_type, m1.n,
                   {_AR2_R} AS r1
            FROM m1
        ),
        r2t AS (
            SELECT m2.event_type, {_AR2_R} AS r2 FROM m2
        )
        SELECT r.event_type, r.n, r.r1, r2t.r2,
               ROUND(r.r1 * (1.0 - r2t.r2) / (1.0 - r.r1 * r.r1), 6) AS phi1,
               ROUND((r2t.r2 - r.r1 * r.r1) / (1.0 - r.r1 * r.r1), 6) AS phi2
        FROM r JOIN r2t ON r2t.event_type = r.event_type
    """,
    doc=(
        "Yule-Walker AR(2) fit per event type over the dense hourly "
        "count series (empty hours are genuine zeros — the "
        "q_events_acf round-4 discipline): lag-1/lag-2 Pearson "
        "autocorrelations from integer-exact BIGINT moment sums, then "
        "the closed forms phi1 = r1(1-r2)/(1-r1^2) and "
        "phi2 = (r2-r1^2)/(1-r1^2) — the autoregressive-model fit "
        "that sits between the ACF diagnostic and the exponential-"
        "smoothing forecasters (an AR(2) with phi2~0 says Holt "
        "suffices; oscillatory phi2<0 says seasonality matters). "
        "Parity: the only floats are the two final divisions and "
        "square roots, with r values rounded to 6 dp before the phi "
        "arithmetic. Scale: hourly rollup is map-side combinable; the "
        "lag joins key on dense integer hours."
    ),
    tags=("timeseries", "statistics", "forecast"),
)
def q_events_ar2_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    hidx = F.expr("cast(ts as long) div 3600")
    hc = e.groupBy("event_type", hidx.alias("hr")).agg(
        F.count("*").alias("cnt")
    )
    bounds = e.agg(F.min(hidx).alias("h0"), F.max(hidx).alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("hr"))
    types = e.select("event_type").distinct()
    dense = (
        grid.crossJoin(F.broadcast(types))
        .join(hc, ["event_type", "hr"], "left")
        .select(
            "event_type", "hr", F.coalesce("cnt", F.lit(0)).alias("c")
        )
    )

    def acf(lag: int) -> DataFrame:
        a = dense.alias("a")
        b = dense.select(
            F.col("event_type").alias("bet"),
            F.col("hr").alias("bhr"),
            F.col("c").alias("y"),
        )
        pairs = a.join(
            b,
            (F.col("bet") == F.col("a.event_type"))
            & (F.col("bhr") == F.col("a.hr") + lag),
        ).select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.c").alias("x"),
            "y",
        )
        m = pairs.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        num = (
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        ).cast("double")
        den = F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ) * F.sqrt(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        )
        return m.select(
            "event_type", "n", F.round(num / den, 6).alias(f"r{lag}")
        )

    r1 = acf(1)
    r2 = acf(2).select(
        F.col("event_type").alias("et2"), "r2"
    )
    joined = r1.join(r2, r1.event_type == F.col("et2"))
    denom = 1.0 - F.col("r1") * F.col("r1")
    return joined.select(
        "event_type",
        "n",
        "r1",
        "r2",
        F.round(F.col("r1") * (1.0 - F.col("r2")) / denom, 6).alias("phi1"),
        F.round((F.col("r2") - F.col("r1") * F.col("r1")) / denom, 6).alias(
            "phi2"
        ),
    )


# ---------------------------------------------------------------------------
# PMI collocations over corpus bigrams
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5


@register(
    "q_text_pmi_bigrams",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        big AS (
            SELECT t[CAST(i AS INTEGER)] AS w1,
                   t[CAST(i AS INTEGER) + 1] AS w2
            FROM tok, UNNEST(range(1, len(t))) AS u(i)
        ),
        bc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
            FROM big GROUP BY w1, w2
        ),
        uni AS (
            SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY w1
        ),
        tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bc)
        SELECT bc.w1, bc.w2, bc.c_xy,
               ROUND(LN(CAST(bc.c_xy AS DOUBLE) * n
                        / (CAST(ux.c AS DOUBLE) * uy.c)), 6) AS pmi
        FROM bc
        JOIN uni ux ON ux.w = bc.w1
        JOIN uni uy ON uy.w = bc.w2
        CROSS JOIN tot
        WHERE bc.c_xy >= {_PMI_MIN_COUNT}
          AND LN(CAST(bc.c_xy AS DOUBLE) * n
                 / (CAST(ux.c AS DOUBLE) * uy.c)) > 0
    """,
    doc=(
        "Pointwise-mutual-information collocation mining over corpus "
        "word bigrams — the classic phrase detector (word2vec's phrase "
        "pass, NLTK collocations): pmi = ln(c_xy*N / (c_x*c_y)) for "
        "bigrams above the support floor (c_xy >= 5) with positive "
        "PMI (the pair co-occurs MORE than independence predicts). "
        "Unigram marginals use first-position counts so probabilities "
        "share one normalizer. Counts are exact BIGINTs; the single "
        "ln rounds to 6 dp. Scale: one explode + two partial-"
        "aggregable groupBys + a broadcast-sized unigram join — the "
        "bigram table is vocab^2-bounded, not corpus-bounded."
    ),
    tags=("text", "statistics", "llm-pipeline"),
)
def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # split ONCE into a projected column first: interpreted higher-order
    # expressions get no CSE, so referencing split(text) inside the
    # transform lambda would re-split per element access (the measured
    # recompute trap from the signature-table build)
    toks = d.select(F.split("text", " ").alias("t"))
    big = toks.select(
        F.explode(
            F.expr(
                "case when size(t) >= 2 then"
                " transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) as w1,"
                "             element_at(t, i + 1) as w2))"
                " else array() end"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = big.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c_xy"))
    uni = big.groupBy(F.col("w1").alias("w")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = bc.agg(F.sum("c_xy").cast("bigint").alias("n"))
    pmi = F.log(
        F.col("c_xy").cast("double")
        * F.col("n")
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    return (
        bc.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("cx"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("cy"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
        .filter(pmi > 0)
        .select("w1", "w2", "c_xy", F.round(pmi, 6).alias("pmi"))
    )


# ---------------------------------------------------------------------------
# Dataset fingerprints
# ---------------------------------------------------------------------------

_FP_H = "cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"
_FP_H_D = "CAST('0x' || md5({expr})[1:15] AS BIGINT)"


def _fp_duck(table: str, key: str, content: str) -> str:
    return f"""
        SELECT '{table}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               BIT_XOR({_FP_H_D.format(expr=content)}) AS content_xor,
               BIT_XOR({_FP_H_D.format(expr=key)}) AS key_xor
        FROM {table}
    """


@register(
    "q_dataset_fingerprint",
    oracle=f"""
        {_fp_duck(
            "orders",
            "CAST(o_orderkey AS VARCHAR)",
            "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
            " || '|' || o_orderstatus || '|' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
        )}
        UNION ALL
        {_fp_duck(
            "customer",
            "CAST(c_custkey AS VARCHAR)",
            "CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||"
            " CAST(c_nationkey AS VARCHAR)",
        )}
    """,
    doc=(
        "Content-addressed dataset fingerprints: per table, the row "
        "count plus order-insensitive BIT_XOR digests of (a) the full "
        "row content and (b) the key column — the cheap equality "
        "certificate a pipeline stores per run to prove a rebuild is "
        "byte-identical, detect drift between environments, or decide "
        "a cache hit without comparing data. XOR aggregation is "
        "commutative/associative (partition-order-free, no overflow) "
        "and one flipped row flips the digest with probability "
        "1-2^-60. One map-side-combinable scan per table; the digest "
        "is 2 words however large the table."
    ),
    tags=("audit", "quality", "agg"),
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(table: str, key_expr: str, content_expr: str) -> DataFrame:
        t = load(spark, sf_dir, table)
        return t.agg(
            F.lit(table).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.expr(f"bit_xor({_FP_H.format(expr=content_expr)})").alias(
                "content_xor"
            ),
            F.expr(f"bit_xor({_FP_H.format(expr=key_expr)})").alias("key_xor"),
        )

    o = fp(
        "orders",
        "cast(o_orderkey as string)",
        "concat(cast(o_orderkey as string), '|', cast(o_custkey as string),"
        " '|', o_orderstatus, '|', cast(cast(round(o_totalprice * 100) as bigint) as string))",
    )
    c = fp(
        "customer",
        "cast(c_custkey as string)",
        "concat(cast(c_custkey as string), '|', c_name, '|',"
        " cast(c_nationkey as string))",
    )
    return o.unionByName(c)
