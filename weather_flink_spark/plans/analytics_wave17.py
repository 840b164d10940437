"""Wave-17 operators (round 4): ANN evaluation for the composed index,
BPE application, privacy audits, bloom-filter index design, power
analysis, and trigram fuzzy matching.

- ``q_sim_ann_ivfpq_recall`` — recall@k of the composed IVF+PQ searcher
  (q_sim_ann_ivfpq) against exact brute-force cosine top-k: the
  production gate for the ADC pipeline, mirroring q_sim_ann_recall.
- ``q_text_bpe_apply`` — apply a fixed ordered BPE merge list to the
  corpus vocabulary (space-separated symbol representation, global
  non-overlapping replaces per merge rank — the batch-apply form of BPE
  encoding) and report per-word subword segmentations.
- ``q_privacy_k_anonymity`` — k-anonymity audit over quasi-identifiers
  (event_type, hour-of-day, value bucket): group sizes and the
  re-identification-risk slice with k below the threshold.
- ``q_privacy_dp_counts`` — epsilon-differentially-private released
  counts: per-type counts plus deterministic Laplace noise from a
  seeded md5 inverse-CDF draw (the bootstrap discipline — never
  rand()).
- ``q_layout_bloom_index`` — file-level bloom-filter index design: per
  simulated file, a 256-bit bloom over its distinct part keys built
  with BIT_OR word aggregation, its fill factor / estimated fpp, and
  membership results for a fixed probe set — the data-skipping index a
  lakehouse table format attaches per file.
- ``q_stats_power_analysis`` — experiment sample-size calculator: per
  event type, the per-arm n required to detect a 5% lift at 80% power /
  alpha 0.05 (the 16-sigma^2-over-delta^2 rule) from exact decimal
  moments.
- ``q_fuzzy_trigram_cosine`` — character-trigram cosine similarity over
  the distinct name dictionary (pg_trgm-style), blocked on (first
  char, length +-4) like the engine's other fuzzy matchers.

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
# IVF+PQ recall harness
# ---------------------------------------------------------------------------


def _ivfpq_recall_oracle() -> str:
    from weather_flink_spark.plans.analytics_wave15 import _ivfpq_oracle
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        IVF_TOP_K,
        _cos_duck,
    )

    return f"""
        WITH ivfpq AS MATERIALIZED ({_ivfpq_oracle()}),
        exact AS (
            SELECT query_id, vec_id FROM (
                SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck('q.embedding', 'v.embedding')} DESC,
                                    v.vec_id ASC
                       ) AS k_rank
                FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
                WHERE q.vec_id < {IVF_N_QUERIES}
            ) WHERE k_rank <= {IVF_TOP_K}
        )
        SELECT e.query_id,
               COUNT(*) AS k,
               COUNT(i.vec_id) AS n_hit,
               CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*) AS recall_at_k
        FROM exact e
        LEFT JOIN ivfpq i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
        GROUP BY e.query_id
    """


@register(
    "q_sim_ann_ivfpq_recall",
    oracle=_ivfpq_recall_oracle(),
    doc=(
        "Recall@k of the composed IVF+PQ searcher against exact "
        "brute-force cosine top-k, per query — the production gate for "
        "the ADC pipeline (mirrors q_sim_ann_recall for the plain IVF "
        "path). The exact side broadcasts the bounded query set; the "
        "approximate side is q_sim_ann_ivfpq verbatim, so the measured "
        "recall is exactly what that query serves. Deterministic "
        "(decimal ADC, tie-broken ranks) and oracle-checkable end to "
        "end. Retained as the 5-query smoke/parity gate; the "
        "representative read is the 100-query panel "
        "(q_sim_recall_panel_pq, r10)."
    ),
    tags=("similarity", "ann", "evaluation", "pq"),
)
def q_sim_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave15 import q_sim_ann_ivfpq
    from weather_flink_spark.plans.llm_extra import exact_topk_table

    approx = q_sim_ann_ivfpq(spark, sf_dir).select("query_id", "vec_id")
    # shared session-cached ground truth — one build serves all three
    # recall gates (see exact_topk_table)
    exact = exact_topk_table(spark, sf_dir)
    hit = exact.join(
        approx.withColumnRenamed("vec_id", "pq_vec").withColumnRenamed(
            "query_id", "pq_query"
        ),
        (F.col("query_id") == F.col("pq_query"))
        & (F.col("vec_id") == F.col("pq_vec")),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.count("pq_vec").alias("n_hit"),
        (F.count("pq_vec").cast("double") / F.count("*")).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# BPE merge application
# ---------------------------------------------------------------------------

# fixed ordered merge list (rank order matters: later merges consume
# symbols earlier merges created)
BPE_MERGES = (
    ("t h", "th"),
    ("th e", "the"),
    ("i n", "in"),
    ("e r", "er"),
    ("a n", "an"),
    ("o r", "or"),
    ("s c", "sc"),
    ("sc an", "scan"),
)


@register(
    "q_text_bpe_apply",
    oracle=f"""
        WITH words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS corpus_freq FROM (
                SELECT UNNEST(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS word
                FROM documents
            ) GROUP BY word
        ),
        seg AS (
            SELECT word, corpus_freq,
                   {"".join("replace(" for _ in BPE_MERGES)}
                   trim(regexp_replace(word, '(.)', '\\1 ', 'g'))
                   {"".join(f", '{a}', '{b}')" for a, b in BPE_MERGES)}
                   AS segmented
            FROM words
        )
        SELECT word, corpus_freq, segmented,
               CAST(len(string_split(segmented, ' ')) AS BIGINT) AS n_subwords
        FROM seg
    """,
    doc=(
        "BPE tokenization APPLY (the encode side of q_text_bpe_pairs's "
        "merge mining): each vocabulary word is spelled as "
        "space-separated symbols and the fixed ordered merge list is "
        "applied as global non-overlapping replaces in rank order — "
        "later merges consume symbols earlier merges created, exactly "
        "the batch-apply form fast BPE encoders use. Runs on the "
        "DISTINCT vocabulary (never the corpus token stream) with "
        "corpus frequencies joined on; both engines execute the "
        "identical replace chain, so segmentations are byte-equal. "
        "Scale: |vocab| rows through pure string expressions."
    ),
    tags=("text", "tokens", "llm-pipeline"),
)
def q_text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("corpus_freq"))
    )
    seg = F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    for a, b in BPE_MERGES:
        seg = F.replace(seg, F.lit(a), F.lit(b))
    return words.select(
        "word",
        "corpus_freq",
        seg.alias("segmented"),
        F.size(F.split(seg, " ")).cast("bigint").alias("n_subwords"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "q_privacy_k_anonymity",
    oracle=f"""
        SELECT event_type,
               EXTRACT(hour FROM ts) AS hr,
               CAST(FLOOR(CAST(value AS DOUBLE) / 25.0) AS BIGINT) AS vbucket,
               CAST(COUNT(*) AS BIGINT) AS k,
               COUNT(*) < {_KANON_K} AS at_risk
        FROM events
        GROUP BY 1, 2, 3
    """,
    doc=(
        "k-anonymity audit: records grouped by the quasi-identifier "
        "tuple (event_type, hour-of-day, coarse value bucket); any "
        "group smaller than k=5 is a re-identification risk — the "
        "data-governance gate run before releasing or sharing a "
        "dataset, and the signal that drives generalization (coarser "
        "buckets) or suppression of the risky slice. One map-side "
        "combinable groupBy; no row-level data leaves the aggregate."
    ),
    tags=("privacy", "audit", "agg"),
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.hour("ts").cast("bigint").alias("hr"),
            F.floor(F.col("value").cast("double") / 25.0)
            .cast("bigint")
            .alias("vbucket"),
        )
        .agg(F.count("*").cast("bigint").alias("k"))
        .select(
            "event_type",
            "hr",
            "vbucket",
            "k",
            (F.col("k") < _KANON_K).alias("at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private released counts
# ---------------------------------------------------------------------------

_DP_EPS = 1.0  # epsilon; Laplace scale b = 1/eps for a count query
_DP_U_SPARK = (
    "(cast(conv(substring(md5(concat('dp:', event_type)), 1, 7), 16, 10)"
    " as double) + 1.0) / 268435457.0"
)
_DP_U_DUCK = (
    "(CAST(CAST('0x' || md5('dp:' || event_type)[1:7] AS BIGINT) AS DOUBLE)"
    " + 1.0) / 268435457.0"
)
# Laplace inverse CDF at uniform u in (0,1): -b*sign(u-0.5)*ln(1-2|u-0.5|)
_DP_NOISE = (
    "ROUND(-(1.0 / {eps}) * CASE WHEN {u} >= 0.5 THEN 1.0 ELSE -1.0 END"
    " * LN(1.0 - 2.0 * ABS({u} - 0.5)), 6)"
)


@register(
    "q_privacy_dp_counts",
    oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS true_count,
               {_DP_NOISE.format(u=_DP_U_DUCK, eps=_DP_EPS)} AS noise,
               CAST(COUNT(*) AS DOUBLE)
                   + {_DP_NOISE.format(u=_DP_U_DUCK, eps=_DP_EPS)} AS released
        FROM events GROUP BY event_type
    """,
    doc=(
        "Differentially-private count release (epsilon=1 Laplace "
        "mechanism, sensitivity 1): per-type counts plus Laplace noise "
        "drawn by inverse CDF over a seeded md5 uniform — the "
        "q_stats_bootstrap_ci determinism discipline, so reruns, "
        "engines and cluster sizes release identical values (rand() "
        "would make the release unreproducible AND un-auditable). The "
        "noise rounds to 6 dp before the sum because ln() drifts an "
        "ulp on rare inputs. true_count stays in the output because "
        "this is the engineering demo of the mechanism, not a "
        "production release boundary."
    ),
    tags=("privacy", "statistics", "sampling"),
)
def q_privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    noise = F.expr(_DP_NOISE.format(u=_DP_U_SPARK, eps=_DP_EPS))
    return (
        e.groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("true_count"))
        .select(
            "event_type",
            "true_count",
            noise.alias("noise"),
            (F.col("true_count").cast("double") + noise).alias("released"),
        )
    )


# ---------------------------------------------------------------------------
# File-level bloom-filter index design
# ---------------------------------------------------------------------------

_BLOOM_FILES = 16
_BLOOM_BITS = 252  # 4 words x 63 bits (the q_agg_bitmap_distinct packing:
# bit 63 stays clear so signed BIGINT shifts never overflow on either engine)
_BLOOM_WORDS = _BLOOM_BITS // 63
_BLOOM_PROBES = (1, 2, 100000, 100001, 100002)  # low keys exist, high don't

# two independent bit positions per key from one md5
_BH1 = "cast(conv(substring(md5(concat('bl1:', cast({k} as string))), 1, 7), 16, 10) as bigint) % {bits}"
_BH2 = "cast(conv(substring(md5(concat('bl2:', cast({k} as string))), 1, 7), 16, 10) as bigint) % {bits}"
_BH1_D = "CAST('0x' || md5('bl1:' || CAST({k} AS VARCHAR))[1:7] AS BIGINT) % {bits}"
_BH2_D = "CAST('0x' || md5('bl2:' || CAST({k} AS VARCHAR))[1:7] AS BIGINT) % {bits}"


def _bloom_oracle() -> str:
    return f"""
        WITH keys AS (
            SELECT DISTINCT l_orderkey % {_BLOOM_FILES} AS file_id,
                   l_partkey AS k
            FROM lineitem
        ),
        bits AS (
            SELECT file_id, UNNEST([
                {_BH1_D.format(k="k", bits=_BLOOM_BITS)},
                {_BH2_D.format(k="k", bits=_BLOOM_BITS)}]) AS pos
            FROM keys
        ),
        words AS (
            SELECT file_id, pos // 63 AS widx,
                   BIT_OR(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS w
            FROM bits GROUP BY 1, 2
        ),
        stats AS (
            SELECT file_id, CAST(SUM(bit_count(w)) AS BIGINT) AS bits_set
            FROM words GROUP BY file_id
        ),
        nkeys AS (
            SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM keys GROUP BY file_id
        ),
        probe_bits AS (
            SELECT p, pos // 63 AS widx,
                   1::BIGINT << CAST(pos % 63 AS INTEGER) AS mask
            FROM (
                SELECT p, UNNEST([
                    {_BH1_D.format(k="p", bits=_BLOOM_BITS)},
                    {_BH2_D.format(k="p", bits=_BLOOM_BITS)}]) AS pos
                FROM (SELECT UNNEST([{", ".join(str(p) for p in _BLOOM_PROBES)}]) AS p)
            )
        ),
        cand AS (
            SELECT f.file_id, pb.p,
                   BOOL_AND(w.w IS NOT NULL
                            AND (w.w & pb.mask) = pb.mask) AS member
            FROM nkeys f
            CROSS JOIN probe_bits pb
            LEFT JOIN words w
              ON w.file_id = f.file_id AND w.widx = pb.widx
            GROUP BY f.file_id, pb.p
        ),
        hits AS (
            SELECT file_id,
                   CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_probe_hits
            FROM cand GROUP BY file_id
        )
        SELECT s.file_id, n.n_keys, s.bits_set,
               ROUND(CAST(s.bits_set AS DOUBLE) / {_BLOOM_BITS}
                     * (CAST(s.bits_set AS DOUBLE) / {_BLOOM_BITS}), 6)
                   AS est_fpp,
               h.n_probe_hits
        FROM stats s
        JOIN nkeys n USING (file_id)
        JOIN hits h USING (file_id)
    """


@register(
    "q_layout_bloom_index",
    oracle=_bloom_oracle(),
    doc=(
        "File-level bloom-filter index design — the per-file key index "
        "a lakehouse format (Delta/Iceberg/Parquet bloom) attaches for "
        "data skipping on high-cardinality point lookups where min/max "
        "zones are useless: per simulated file (orderkey mod 16), a "
        "252-bit / 2-hash bloom over its distinct part keys, built "
        "relationally as 4 BIT_OR'd 63-bit-packed words (the shuffle carries "
        "4 words per file, never the keys); reported per file: key "
        "count, fill factor, the (bits_set/m)^k false-positive "
        "estimate, and membership verdicts for a fixed probe set "
        "(3 of the 5 probes do not exist anywhere — files answering "
        "'maybe' for those quantify the real fpp). Seeded md5 bit "
        "positions make the index byte-deterministic on both engines."
    ),
    tags=("layout", "scan", "scale"),
)
def q_layout_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    keys = li.select(
        (F.col("l_orderkey") % _BLOOM_FILES).alias("file_id"),
        F.col("l_partkey").alias("k"),
    ).distinct()
    h1 = F.expr(_BH1.format(k="k", bits=_BLOOM_BITS))
    h2 = F.expr(_BH2.format(k="k", bits=_BLOOM_BITS))
    bits = keys.select(
        "file_id", F.explode(F.array(h1, h2)).alias("pos")
    )
    words = (
        bits.groupBy(
            "file_id", F.expr("pos div 63").alias("widx")
        )
        .agg(
            F.expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int)))").alias("w")
        )
    )
    stats = words.groupBy("file_id").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("bits_set")
    )
    nkeys = keys.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_keys")
    )
    probes = load(spark, sf_dir, "lineitem").sparkSession.createDataFrame(
        [(p,) for p in _BLOOM_PROBES], "p bigint"
    )
    ph1 = F.expr(_BH1.format(k="p", bits=_BLOOM_BITS))
    ph2 = F.expr(_BH2.format(k="p", bits=_BLOOM_BITS))
    probe_bits = probes.select(
        "p", F.explode(F.array(ph1, ph2)).alias("pos")
    ).select(
        "p",
        F.expr("pos div 63").alias("pwidx"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias("mask"),
    )
    cand = (
        nkeys.select("file_id")
        .crossJoin(F.broadcast(probe_bits))
        .join(
            words.withColumnRenamed("file_id", "wfile"),
            (F.col("wfile") == F.col("file_id"))
            & (F.col("widx") == F.col("pwidx")),
            "left",
        )
        .groupBy("file_id", "p")
        .agg(
            F.bool_and(
                F.col("w").isNotNull()
                & (F.col("w").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("member")
        )
    )
    hits = cand.groupBy("file_id").agg(
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_probe_hits")
    )
    fill = F.col("bits_set").cast("double") / _BLOOM_BITS
    return (
        stats.join(nkeys, "file_id")
        .join(hits, "file_id")
        .select(
            "file_id",
            "n_keys",
            "bits_set",
            F.round(fill * fill, 6).alias("est_fpp"),
            "n_probe_hits",
        )
    )


# ---------------------------------------------------------------------------
# Experiment power analysis
# ---------------------------------------------------------------------------

_POWER_MDE_FRAC = 0.05  # detect a 5% lift


@register(
    "q_stats_power_analysis",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_obs,
                   CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                                 AS DECIMAL(18,6))) AS DOUBLE)
                       / COUNT(*) AS mean_v,
                   (CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                                  AS DECIMAL(12,6))
                             * CAST(ROUND(CAST(value AS DOUBLE), 6)
                                    AS DECIMAL(12,6))) AS DOUBLE)
                    - CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                                    AS DECIMAL(18,6))) AS DOUBLE)
                      * CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 6)
                                      AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*))
                   / (COUNT(*) - 1) AS var_v
            FROM events GROUP BY event_type
        )
        SELECT event_type, n_obs,
               ROUND(mean_v, 6) AS mean_v,
               ROUND(var_v, 6) AS var_v,
               ROUND(mean_v * {_POWER_MDE_FRAC}, 6) AS mde,
               CAST(CEIL(16.0 * var_v
                         / ((mean_v * {_POWER_MDE_FRAC})
                            * (mean_v * {_POWER_MDE_FRAC}))) AS BIGINT)
                   AS n_per_arm,
               n_obs >= 2 * CAST(CEIL(16.0 * var_v
                         / ((mean_v * {_POWER_MDE_FRAC})
                            * (mean_v * {_POWER_MDE_FRAC}))) AS BIGINT)
                   AS currently_powered
        FROM m
    """,
    doc=(
        "Experiment sample-size calculator (the 16-sigma^2-over-"
        "delta^2 rule: 80% power, alpha 0.05, two-sided): per event "
        "type, the per-arm n required to detect a 5% lift of the "
        "metric's own mean, from exact DECIMAL moments (6dp-quantized "
        "inputs so both engines aggregate identical decimals — the "
        "Welch-test discipline). The 'currently_powered' verdict says "
        "whether today's volume could already run that experiment. "
        "One partial-aggregable groupBy."
    ),
    tags=("statistics", "experimentation"),
)
def q_stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v6 = F.round(F.col("value").cast("double"), 6)
    vd18 = v6.cast("decimal(18,6)")
    vd12 = v6.cast("decimal(12,6)")
    m = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum(vd18).cast("double").alias("s1"),
        F.sum(vd12 * vd12).cast("double").alias("s2"),
    )
    mean_v = F.col("s1") / F.col("n_obs")
    var_v = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_obs")) / (
        F.col("n_obs") - 1
    )
    mde = mean_v * _POWER_MDE_FRAC
    n_arm = F.ceil(16.0 * var_v / (mde * mde)).cast("bigint")
    return m.select(
        "event_type",
        "n_obs",
        F.round(mean_v, 6).alias("mean_v"),
        F.round(var_v, 6).alias("var_v"),
        F.round(mde, 6).alias("mde"),
        n_arm.alias("n_per_arm"),
        (F.col("n_obs") >= 2 * n_arm).alias("currently_powered"),
    )


# ---------------------------------------------------------------------------
# Trigram cosine fuzzy matching
# ---------------------------------------------------------------------------

_TRGM_THRESHOLD = 0.55


@register(
    "q_fuzzy_trigram_cosine",
    oracle=f"""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        p AS (
            SELECT p_name, length(p_name) AS ln, p_name[1:1] AS c1,
                   list_distinct(list_transform(
                       range(1, length(p_name) - 1),
                       i -> p_name[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)]
                   )) AS grams
            FROM names WHERE length(p_name) >= 3
        )
        SELECT name_a, name_b, n_shared, cosine FROM (
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT)
                       AS n_shared,
                   ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / SQRT(CAST(len(a.grams) AS DOUBLE)
                                * CAST(len(b.grams) AS DOUBLE)), 6) AS cosine
            FROM p a JOIN p b
              ON a.c1 = b.c1
             AND b.ln BETWEEN a.ln - 4 AND a.ln + 4
             AND a.p_name < b.p_name
        ) WHERE cosine >= {_TRGM_THRESHOLD}
    """,
    doc=(
        "Character-trigram cosine fuzzy matching over the DISTINCT "
        "name dictionary (the pg_trgm similarity model): distinct "
        "trigram sets per name, cosine = |A intersect B| / "
        "sqrt(|A||B|), blocked on (first char, length +-4) exactly "
        "like the engine's Levenshtein and Jaro-Winkler matchers — "
        "the third edit-model in the entity-resolution toolkit "
        "(set-overlap tolerance vs edit ops vs transposition-weighted). "
        "Pure JVM array expressions; the pair space is the same "
        "bounded block join the other matchers share."
    ),
    tags=("dedup", "fuzzy", "entity-resolution"),
)
def q_fuzzy_trigram_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .filter(F.length("p_name") >= 3)
        .select(
            "p_name",
            F.length("p_name").alias("ln"),
            F.substring("p_name", 1, 1).alias("c1"),
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(p_name) - 2),"
                    " i -> substring(p_name, i, 3))"
                )
            ).alias("grams"),
        )
    )
    a, b = p.alias("a"), p.alias("b")
    shared = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    cosine = F.round(
        shared.cast("double")
        / F.sqrt(
            F.size(F.col("a.grams")).cast("double")
            * F.size(F.col("b.grams")).cast("double")
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.c1") == F.col("b.c1"))
            & (F.col("b.ln").between(F.col("a.ln") - 4, F.col("a.ln") + 4))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            shared.cast("bigint").alias("n_shared"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= _TRGM_THRESHOLD)
    )
