"""Seventh wave: longitudinal + resampling analytics (SURVEY.md §2-C).

- ``q_orders_cohort_ltv``    — cohort lifetime-value curves: customers
                               grouped by first-order month, cumulative
                               revenue per cohort by months-since-first
                               (the retention-economics companion to
                               q_events_retention's activity matrix).
- ``q_stats_bootstrap_ci``   — distributed Poisson bootstrap: B
                               deterministic resamples of the order-
                               value mean via seeded-hash Poisson(1)
                               weights — the classic way to bootstrap
                               a dataset too large to resample by
                               index (each row draws its own weight
                               per replicate; no shuffle of the data,
                               no driver-side resampling).

Parity discipline as everywhere: seeded md5-derived randomness (never
rand()), DECIMAL-exact money sums, identical aliases both engines.
The reference has no batch analytics surface (empty plan body,
WeatherProcessingJobPlan.java:9-11); these are §2-C north-star rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Cohort lifetime value
# ---------------------------------------------------------------------------


@register(
    "q_orders_cohort_ltv",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey,
                   CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        sizes AS (
            SELECT cohort, COUNT(*) AS cohort_size
            FROM first_order GROUP BY cohort
        ),
        rev AS (
            SELECT f.cohort,
                   (EXTRACT(YEAR FROM o.o_orderdate) * 12
                      + EXTRACT(MONTH FROM o.o_orderdate))
                   - (EXTRACT(YEAR FROM f.cohort) * 12
                      + EXTRACT(MONTH FROM f.cohort)) AS age_months,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev_dec
            FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
            GROUP BY 1, 2
        )
        SELECT r.cohort, CAST(r.age_months AS BIGINT) AS age_months,
               r.n_orders,
               CAST(r.rev_dec AS DOUBLE) AS revenue,
               CAST(SUM(r.rev_dec) OVER (PARTITION BY r.cohort
                        ORDER BY r.age_months ASC) AS DOUBLE) AS cum_revenue,
               s.cohort_size,
               CAST(SUM(r.rev_dec) OVER (PARTITION BY r.cohort
                        ORDER BY r.age_months ASC) AS DOUBLE)
                   / s.cohort_size AS ltv_per_customer
        FROM rev r JOIN sizes s ON s.cohort = r.cohort
    """,
    doc=(
        "Cohort LTV curves: cohort = first-order month, age = months "
        "since cohort, cumulative DECIMAL revenue per cohort divided by "
        "cohort size. Two partial-aggregated rollups (first-order per "
        "customer, revenue per cohort-age) + one per-cohort running-sum "
        "window over the tiny cohort×age grid — the fact table is never "
        "windowed. The running sum accumulates DECIMAL and casts at the "
        "edge, so the cumulative column is order-independent exact."
    ),
    tags=("analytics", "cohort", "window"),
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    rev = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort",
            (months(F.col("o_orderdate")) - months(F.col("cohort"))).alias("age_months"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"),
        )
    )
    w = Window.partitionBy("cohort").orderBy(F.col("age_months").asc())
    return (
        rev.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            F.col("age_months").cast("bigint").alias("age_months"),
            "n_orders",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
            "cohort_size",
            (F.sum("rev_dec").over(w).cast("double") / F.col("cohort_size")).alias(
                "ltv_per_customer"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Distributed deterministic Poisson bootstrap
# ---------------------------------------------------------------------------

_B = 40  # bootstrap replicates
# Poisson(1) CDF thresholds for the inverse-CDF draw (identical literals
# in both engines; weight capped at 6, P(>6) ≈ 8e-5)
_POIS = (
    "CASE WHEN {u} < 0.36787944117144233 THEN 0 "
    "WHEN {u} < 0.73575888234288467 THEN 1 "
    "WHEN {u} < 0.91969860292860584 THEN 2 "
    "WHEN {u} < 0.98101184312384615 THEN 3 "
    "WHEN {u} < 0.99634015317265629 THEN 4 "
    "WHEN {u} < 0.99940581518241833 THEN 5 ELSE 6 END"
)
_U_SPARK = (
    "(cast(conv(substring(md5(concat('boot:', cast(b as string), ':',"
    " cast(o_orderkey as string))), 1, 7), 16, 10) as double) / 268435456.0)"
)
_U_DUCK = (
    "(CAST(CAST('0x' || md5('boot:' || CAST(b AS VARCHAR) || ':'"
    " || CAST(o_orderkey AS VARCHAR))[1:7] AS BIGINT) AS DOUBLE) / 268435456.0)"
)


@register(
    "q_stats_bootstrap_ci",
    oracle=f"""
        WITH draws AS (
            SELECT b, o_orderkey, o_totalprice,
                   {_POIS.format(u=_U_DUCK)} AS w
            FROM orders CROSS JOIN (SELECT UNNEST(range(1, {_B + 1})) AS b)
        )
        SELECT b,
               CAST(SUM(w) AS BIGINT) AS n_eff,
               CAST(SUM(CAST(w * o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / SUM(w) AS resample_mean
        FROM draws
        GROUP BY b
    """,
    doc=(
        "Distributed Poisson bootstrap of the mean order value: each of "
        "B=40 replicates draws a deterministic Poisson(1) weight per row "
        "(inverse-CDF over a seeded md5 uniform — reruns, engines and "
        "cluster sizes agree; rand() would not), and the replicate "
        "statistic is the weight-weighted DECIMAL mean. This is how you "
        "bootstrap 100 TB: no index resampling, no data movement — one "
        "map-side weight column per replicate and a B-key aggregation "
        "whose shuffle is B partial rows per task. Downstream, the "
        "percentiles of resample_mean give the CI."
    ),
    tags=("stats", "bootstrap", "sampling"),
)
def q_stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    draws = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.expr(f"sequence(1, {_B})")).alias("b"),
    ).select("b", "o_orderkey", "o_totalprice", F.expr(_POIS.format(u=_U_SPARK)).alias("w"))
    return draws.groupBy("b").agg(
        F.sum("w").cast("bigint").alias("n_eff"),
        (
            F.sum((F.col("w") * F.col("o_totalprice")).cast("decimal(18,6)")).cast(
                "double"
            )
            / F.sum("w")
        ).alias("resample_mean"),
    )


# ---------------------------------------------------------------------------
# Keyword extraction: top-k TF-IDF terms per document
# ---------------------------------------------------------------------------

_KW_K = 3


@register(
    "q_text_keywords_topk",
    oracle=None,  # composed below from q_text_tfidf's oracle text
    doc=(
        "Keyword extraction: the top-3 TF-IDF terms per document with "
        "deterministic tie-break — rides q_text_tfidf's scoring (its "
        "oracle text is reused verbatim as a CTE so scorer and extractor "
        "cannot drift). Per-doc window over the already-aggregated "
        "(doc, term) table; WindowGroupLimit pushes k=3 into the sort, "
        "so per-partition traffic is O(k·docs), not O(terms)."
    ),
    tags=("text", "keywords", "tfidf"),
)
def q_text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_text_tfidf

    scored = q_text_tfidf(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KW_K)
        .select("doc_id", "token", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# Quality-filter ensemble: the actual keep/drop gate with reasons
# ---------------------------------------------------------------------------

_ENS_NLL_MAX = 3.40
_ENS_DUP3_MAX = 0.01


@register(
    "q_quality_ensemble",
    oracle=None,  # composed below from the three member oracles
    doc=(
        "The end-of-pipeline quality gate: Gopher rules ∧ repetition "
        "ceiling ∧ perplexity ceiling, with the first failing rule as "
        "the per-document verdict (the audit trail a curator needs to "
        "tune kill rates). All three member signals are the registered "
        "operators themselves — Spark side composes their DataFrames, "
        "and the oracle composes their oracle SQL texts as CTEs, so the "
        "ensemble can never drift from its members. Joins are on "
        "doc_id (co-partitioned rollups of the same corpus scan)."
    ),
    tags=("text", "quality", "ensemble"),
)
def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import q_text_perplexity_bigram
    from weather_flink_spark.plans.llm_wave5 import q_text_gopher_rules
    from weather_flink_spark.plans.pipeline_extra import q_text_repetition

    g = q_text_gopher_rules(spark, sf_dir).select("doc_id", "gopher_pass")
    r = q_text_repetition(spark, sf_dir).select("doc_id", "dup_trigram_frac")
    p = q_text_perplexity_bigram(spark, sf_dir).select("doc_id", "avg_nll")
    dup = F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0))
    keep = (
        F.col("gopher_pass")
        & (dup <= _ENS_DUP3_MAX)
        & (F.col("avg_nll") <= _ENS_NLL_MAX)
    )
    verdict = (
        F.when(~F.col("gopher_pass"), "gopher_rules")
        .when(dup > _ENS_DUP3_MAX, "repetition")
        .when(F.col("avg_nll") > _ENS_NLL_MAX, "perplexity")
        .otherwise("kept")
    )
    return (
        g.join(r, "doc_id")
        .join(p, "doc_id")
        .select(
            "doc_id",
            "gopher_pass",
            "dup_trigram_frac",
            "avg_nll",
            keep.alias("keep"),
            verdict.alias("verdict"),
        )
    )


def _install_composed_oracles() -> None:
    """Compose member oracle texts so composites can never drift."""
    import dataclasses

    from weather_flink_spark.plans.registry import _REGISTRY
    from weather_flink_spark.plans import llm_extra, llm_wave5, pipeline_extra  # noqa: F401
    from weather_flink_spark.plans import analytics_wave4  # noqa: F401

    def _swap(name: str, oracle: str) -> None:
        # dataclasses.replace: future QuerySpec fields survive the swap
        _REGISTRY[name] = dataclasses.replace(_REGISTRY[name], oracle=oracle)

    tfidf = _REGISTRY["q_text_tfidf"].oracle
    _swap(
        "q_text_keywords_topk",
        f"""
        WITH scored AS ({tfidf})
        SELECT doc_id, token, tfidf, rk FROM (
            SELECT doc_id, token, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, token ASC) AS rk
            FROM scored
        ) WHERE rk <= {_KW_K}
        """,
    )

    gopher = _REGISTRY["q_text_gopher_rules"].oracle
    rep = _REGISTRY["q_text_repetition"].oracle
    perp = _REGISTRY["q_text_perplexity_bigram"].oracle
    _swap(
        "q_quality_ensemble",
        f"""
        WITH g AS ({gopher}), r AS ({rep}), p AS ({perp})
        SELECT g.doc_id, g.gopher_pass, r.dup_trigram_frac, p.avg_nll,
               (g.gopher_pass
                AND COALESCE(r.dup_trigram_frac, 0.0) <= {_ENS_DUP3_MAX}
                AND p.avg_nll <= {_ENS_NLL_MAX}) AS keep,
               CASE WHEN NOT g.gopher_pass THEN 'gopher_rules'
                    WHEN COALESCE(r.dup_trigram_frac, 0.0) > {_ENS_DUP3_MAX}
                         THEN 'repetition'
                    WHEN p.avg_nll > {_ENS_NLL_MAX} THEN 'perplexity'
                    ELSE 'kept' END AS verdict
        FROM g JOIN r ON r.doc_id = g.doc_id
        JOIN p ON p.doc_id = g.doc_id
        """,
    )


_install_composed_oracles()


# ---------------------------------------------------------------------------
# LSH S-curve tuning table (bands × rows design tool)
# ---------------------------------------------------------------------------

# (bands, rows) configurations of an 8-permutation MinHash signature
_LSH_CONFIGS = ((8, 1), (4, 2), (2, 4), (1, 8))


@register(
    "q_dedup_lsh_scurve",
    oracle=None,  # composed below from q_dedup_ngram_jaccard's oracle text
    doc=(
        "The LSH design tool: for each (bands b, rows r) split of an "
        "8-perm MinHash signature, the expected recall over the measured "
        "near-duplicate pairs — detection probability 1−(1−s^r)^b at "
        "each pair's true Jaccard s, averaged. Powers are expanded to "
        "explicit products (s², s⁴, s⁸ by squaring) so no libm pow "
        "enters the cross-engine comparison, and the average sums "
        "DECIMAL-quantized probabilities. This is the table you read "
        "before picking a banding scheme at 100 TB: it rides the "
        "already-verified pair table (pair count scales with duplicate "
        "structure, not corpus size)."
    ),
    tags=("dedup", "lsh", "tuning"),
)
def q_dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select(F.col("jaccard").alias("s"))
    # integer powers by squaring — multiplication only, engine-exact
    powed = pairs.select(
        "s",
        (F.col("s") * F.col("s")).alias("s2"),
    ).select("s", "s2", (F.col("s2") * F.col("s2")).alias("s4"))
    powed = powed.select("s", "s2", "s4", (F.col("s4") * F.col("s4")).alias("s8"))

    def prob(b: int, r: int):
        sr = {1: F.col("s"), 2: F.col("s2"), 4: F.col("s4"), 8: F.col("s8")}[r]
        miss = F.lit(1.0) - sr  # (1 - s^r)
        acc = F.lit(1.0)
        for _ in range(b):
            acc = acc * miss
        return F.lit(1.0) - acc

    # ONE pass over the pair table: each pair row explodes into its 4
    # per-config probability structs. The previous 4-way unionByName
    # re-planned (and re-executed) the entire upstream near-dup pair
    # mining once per config — 4 identical 9-exchange subtrees, 27
    # exchanges total (r11 before-plan); the explode keeps the math
    # per element identical (same DECIMAL(18,12) quantization) in a
    # single subtree.
    cfg_structs = [
        F.struct(
            F.lit(f"b{b}r{r}").alias("config"),
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            prob(b, r).cast("decimal(18,12)").alias("p_dec"),
        )
        for b, r in _LSH_CONFIGS
    ]
    allp = powed.select(
        F.explode(F.array(*cfg_structs)).alias("cfg")
    ).select("cfg.*")
    return allp.groupBy("config", "bands", "rows_per_band").agg(
        F.count("*").alias("n_pairs"),
        (F.sum("p_dec").cast("double") / F.count("*")).alias("expected_recall"),
    )


def _install_lsh_scurve_oracle() -> None:
    import dataclasses

    from weather_flink_spark.plans.registry import _REGISTRY
    from weather_flink_spark.plans import llm_extra  # noqa: F401

    base = _REGISTRY["q_dedup_ngram_jaccard"].oracle
    cfg_rows = ", ".join(f"({b}, {r})" for b, r in _LSH_CONFIGS)
    sr = {1: "s", 2: "s2", 4: "s4", 8: "s8"}
    prob_cases = " ".join(
        f"WHEN r = {r} AND b = {b} THEN 1.0 - {'*'.join([f'(1.0 - {sr[r]})'] * b)}"
        for b, r in _LSH_CONFIGS
    )
    oracle = f"""
        WITH pairs AS ({base}),
        powed AS (
            SELECT jaccard AS s, jaccard * jaccard AS s2,
                   (jaccard * jaccard) * (jaccard * jaccard) AS s4,
                   ((jaccard * jaccard) * (jaccard * jaccard))
                     * ((jaccard * jaccard) * (jaccard * jaccard)) AS s8
            FROM pairs
        ),
        cfg AS (SELECT * FROM (VALUES {cfg_rows}) AS t(b, r)),
        probs AS (
            SELECT 'b' || CAST(b AS VARCHAR) || 'r' || CAST(r AS VARCHAR)
                       AS config,
                   b AS bands, r AS rows_per_band,
                   CAST(CASE {prob_cases} END AS DECIMAL(18,12)) AS p_dec
            FROM powed CROSS JOIN cfg
        )
        SELECT config, bands, rows_per_band,
               COUNT(*) AS n_pairs,
               CAST(SUM(p_dec) AS DOUBLE) / COUNT(*) AS expected_recall
        FROM probs
        GROUP BY config, bands, rows_per_band
    """
    _REGISTRY["q_dedup_lsh_scurve"] = dataclasses.replace(
        _REGISTRY["q_dedup_lsh_scurve"], oracle=oracle
    )


_install_lsh_scurve_oracle()
