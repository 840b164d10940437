"""Wave-9 operators (round 3, second half): substring-level dedup,
sampling estimators, multiple-testing control, recommender candidates,
and binary-file ingestion.

- ``q_text_suffix_dup_spans`` — exact repeated-substring spans (the
  suffix-array dedup signal of "Deduplicating Training Data Makes
  Language Models Better", Lee et al. 2022, re-expressed relationally):
  every corpus position opens a K-token gram; grams occurring ≥ 2×
  corpus-wide mark their positions duplicated; per-doc maximal spans
  come from interval-merging the marked positions. Per doc: span count,
  covered tokens, duplicated-token fraction — the "cut these spans"
  table a substring-dedup pass consumes.
- ``q_text_ttr_window`` — windowed type-token ratio (lexical-diversity
  gate): distinct/total tokens per fixed 20-token window, averaged per
  doc; the length-robust diversity score curation pipelines use where
  raw TTR would punish long documents.
- ``q_text_domain_mix`` — temperature-based domain reweighting
  (the Pile/DoReMi-style static mix): per-source token shares are
  re-tempered with alpha = 0.5 (p^alpha renormalized) and surfaced as
  per-source sampling weights target/current.
- ``q_sample_horvitz_thompson`` — length-proportional Poisson sampling
  with the Horvitz-Thompson estimator: deterministic seeded inclusion
  with pi_i = min(1, n_chars/C); HT-estimated token totals vs truth
  per source — the estimator a budgeted curation pass uses to audit
  what a biased sample represents.
- ``q_stats_permutation_test`` — randomization test for the
  click-vs-view mean value gap: R=64 deterministic reassignments
  (seeded md5 coin per (rep, event)), one conditional-aggregation pass
  over an exploded rep dimension, p = (1 + #{|diff_r| >= |obs|})/(R+1).
- ``q_stats_benjamini_hochberg`` — BH step-up FDR control applied per
  event-type family over day-of-week mean shifts: Welch z per (type,
  dow) vs the type's other days, two-sided normal p via the
  Abramowitz-Stegun 26.2.17 polynomial (identical double ops in both
  engines), then the BH rank / threshold / step-up rejection set.
- ``q_events_rate_limit`` — per-(user, hour) throttling sample: keep
  the first M=3 events by time, report kept volume per type — the
  standard "bound any single key's contribution" pre-aggregation gate.
- ``q_graph_item_jaccard`` — item-item Jaccard over the customer-part
  bipartite graph (recommender candidate generation): per-customer
  part sets, degree-capped, pair co-occurrence via a customer-local
  self-join, Jaccard against capped-universe item degrees.
- ``q_sim_contrastive_negatives`` — hard-negative mining for
  contrastive training: for each query vector, the top non-duplicate
  neighbors (cosine < 0.95) inside its trained IVF cell — rides the
  session-cached fixed-k assignment and composes its oracle from the
  shared CTE so the centroid rule cannot drift.
- ``q_source_binaryfile_ingest`` — opaque-binary ingestion: documents
  written as source-partitioned text files, re-read through the
  ``binaryFile`` source (whole-file bytes + path metadata), decoded,
  line-split and digest-aggregated per source; the oracle computes the
  same order-insensitive digest sum from the pristine parquet.

Parity discipline as everywhere (plans/registry.py): md5-derived
60-bit hashes on both engines, exact DECIMAL moments with one rounding
at definition, identical double-op order (Horner-form polynomials, no
pow), deterministic tie-breaks, identical aliases. Scale notes live on
each query's doc — no partitionless windows, no unbounded broadcasts,
no driver-side data loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

# ---------------------------------------------------------------------------
# Exact repeated-substring spans (relational suffix-array dedup signal)
# ---------------------------------------------------------------------------

_SPAN_K = 8  # gram width in tokens; spans are unions of [pos, pos+K-1]

_SPAN_GH_SPARK = (
    "cast(conv(substring(md5(concat_ws(' ',"
    " element_at(tok, cast(i as int)), element_at(tok, cast(i + 1 as int)),"
    " element_at(tok, cast(i + 2 as int)), element_at(tok, cast(i + 3 as int)),"
    " element_at(tok, cast(i + 4 as int)), element_at(tok, cast(i + 5 as int)),"
    " element_at(tok, cast(i + 6 as int)), element_at(tok, cast(i + 7 as int)))),"
    " 1, 15), 16, 10) as bigint)"
)
_SPAN_GH_DUCK = (
    "CAST('0x' || md5(concat_ws(' ', tok[i], tok[i+1], tok[i+2], tok[i+3],"
    " tok[i+4], tok[i+5], tok[i+6], tok[i+7]))[1:15] AS BIGINT)"
)


@register(
    "q_text_suffix_dup_spans",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        g AS (
            SELECT doc_id, i AS pos, {_SPAN_GH_DUCK} AS gh
            FROM tok, UNNEST(range(1, len(tok) - {_SPAN_K - 2})) AS r(i)
            WHERE len(tok) >= {_SPAN_K}
        ),
        dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
        dpos AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
        isl AS (
            SELECT doc_id, pos,
                   SUM(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_K}
                       THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS island
            FROM (SELECT doc_id, pos,
                         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                  FROM dpos)
        ),
        spans AS (
            SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
            FROM isl GROUP BY doc_id, island
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_dup_spans,
                   SUM(e - s + {_SPAN_K}) AS dup_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT p.doc_id,
               CAST(len(t.tok) AS BIGINT) AS n_tokens,
               p.n_dup_spans,
               CAST(p.dup_tokens AS BIGINT) AS dup_tokens,
               CAST(p.dup_tokens AS DOUBLE) / len(t.tok) AS dup_frac
        FROM per_doc p JOIN tok t USING (doc_id)
    """,
    doc=(
        "Exact repeated-substring spans, the relational form of the "
        "suffix-array dedup signal (Lee et al. 2022): K=8-token gram "
        "digests per corpus position, grams occurring >= 2 times "
        "corpus-wide mark their positions, marked positions merge into "
        "maximal spans per doc (interval union via gaps-and-islands), "
        "yielding span count / covered tokens / duplicated fraction per "
        "document. Scale: the gram stream is map-side (digests, never "
        "text), the duplicate set is one partial-aggregated groupBy on "
        "the digest key, the join-back is digest-keyed, and the island "
        "windows are partitioned by doc_id — nothing global, nothing "
        "quadratic; cost is corpus tokens x 1 gram each, the same "
        "asymptotics as the MinHash shingle pass."
    ),
    tags=("text", "dedup", "substring", "llm-pipeline"),
)
def q_text_suffix_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok")
    )
    g = (
        tok.where(F.expr(f"size(tok) >= {_SPAN_K}"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tok) - {_SPAN_K - 1}),"
                    f" i -> struct(i as pos, {_SPAN_GH_SPARK} as gh))"
                )
            ).alias("pg"),
        )
        .select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.gh").alias("gh"))
        # snapshot the narrow (doc_id, pos, gh) proxy: the dup-gram
        # aggregate, the span join AND the token count below all read
        # it — the corpus was previously re-tokenized once per branch
        # (guide §8: decide on the lightweight fingerprint table) (r11)
        .transform(snapshot(eager=False))
    )
    dup = g.groupBy("gh").agg(F.count("*").alias("n")).where("n >= 2").select("gh")
    dpos = g.join(dup, "gh").select("doc_id", "pos")
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = dpos.withColumn("prev", F.lag("pos").over(w_lag)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > _SPAN_K), 1
            ).otherwise(0)
        ).over(w_run),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + F.lit(_SPAN_K)).alias("dup_tokens"),
    )
    # n_tokens from the gram table itself: positions run 1..size-K+1,
    # so size(tok) == max(pos) + K - 1 exactly for every doc in g (and
    # every doc with a dup span is in g) — no re-tokenization join
    ntok = g.groupBy("doc_id").agg(
        (F.max("pos") + F.lit(_SPAN_K - 1)).cast("bigint").alias("n_tokens")
    )
    return per_doc.join(ntok, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_dup_spans",
        F.col("dup_tokens").cast("bigint").alias("dup_tokens"),
        (F.col("dup_tokens").cast("double") / F.col("n_tokens")).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Windowed type-token ratio (lexical diversity)
# ---------------------------------------------------------------------------

_TTR_W = 20  # tokens per TTR window (full windows only)


@register(
    "q_text_ttr_window",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tok
            FROM documents
        ),
        w AS (
            SELECT doc_id, lang, len(tok) AS n_tokens,
                   len(tok) // {_TTR_W} AS n_windows,
                   list_transform(
                       range(0, len(tok) // {_TTR_W}),
                       k -> CAST(len(list_distinct(
                                tok[k * {_TTR_W} + 1 : (k + 1) * {_TTR_W}]))
                            AS DOUBLE) / {_TTR_W}) AS ttrs
            FROM tok
            WHERE len(tok) >= {_TTR_W}
        )
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_windows AS BIGINT) AS n_windows,
               ROUND(list_sum(ttrs) / n_windows, 6) AS mean_ttr,
               ROUND(CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok), 6)
                   AS raw_ttr
        FROM w JOIN tok USING (doc_id, lang)
    """,
    doc=(
        "Windowed type-token ratio: distinct/total tokens over fixed "
        "20-token windows averaged per document — the length-robust "
        "lexical-diversity gate (raw TTR shrinks with document length, "
        "so curation pipelines window it). Pure JVM array expressions "
        "(slice + array_distinct per window), map-side only, no shuffle "
        "at all beyond the scan; per-row cost is tokens/W windows of W "
        "work each, linear in corpus size."
    ),
    tags=("text", "text-analysis", "quality"),
)
def q_text_ttr_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok")
    ).where(F.expr(f"size(tok) >= {_TTR_W}"))
    ttrs = F.expr(
        f"transform(sequence(0, cast(size(tok) / {_TTR_W} as int) - 1),"
        f" k -> cast(size(array_distinct(slice(tok, k * {_TTR_W} + 1, {_TTR_W})))"
        f" as double) / {_TTR_W})"
    )
    return (
        tok.withColumn("ttrs", ttrs)
        .select(
            "doc_id",
            "lang",
            F.expr("cast(size(tok) as bigint)").alias("n_tokens"),
            F.expr(f"cast(size(tok) div {_TTR_W} as bigint)").alias("n_windows"),
            # greatest(..., 1): value-identical for rows passing the
            # size >= W filter, but safe when Catalyst reorders a
            # downstream predicate below that filter (ANSI div-by-zero)
            F.round(
                F.expr("aggregate(ttrs, cast(0.0 as double), (a, x) -> a + x)")
                / F.expr(f"greatest(cast(size(tok) div {_TTR_W} as int), 1)"),
                6,
            ).alias("mean_ttr"),
            F.round(
                F.expr("cast(size(array_distinct(tok)) as double) / size(tok)"), 6
            ).alias("raw_ttr"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based domain reweighting (static mix design)
# ---------------------------------------------------------------------------


@register(
    "q_text_domain_mix",
    oracle="""
        WITH per_src AS (
            SELECT source,
                   COUNT(*) AS n_docs,
                   SUM(len(list_filter(string_split(text, ' '), t -> t <> '')))
                       AS tokens
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT SUM(tokens) AS tot_tokens,
                   SUM(CAST(ROUND(SQRT(CAST(tokens AS DOUBLE)), 6)
                            AS DECIMAL(28,6))) AS tot_sqrt
            FROM per_src
        )
        SELECT p.source, p.n_docs, CAST(p.tokens AS BIGINT) AS tokens,
               CAST(p.tokens AS DOUBLE) / t.tot_tokens AS cur_share,
               CAST(CAST(ROUND(SQRT(CAST(p.tokens AS DOUBLE)), 6)
                         AS DECIMAL(28,6)) AS DOUBLE)
                   / CAST(t.tot_sqrt AS DOUBLE) AS target_share,
               ROUND((CAST(CAST(ROUND(SQRT(CAST(p.tokens AS DOUBLE)), 6)
                                AS DECIMAL(28,6)) AS DOUBLE)
                      / CAST(t.tot_sqrt AS DOUBLE))
                     / (CAST(p.tokens AS DOUBLE) / t.tot_tokens), 6) AS weight
        FROM per_src p CROSS JOIN tot t
    """,
    doc=(
        "Static domain-mix design (the Pile / temperature-sampling "
        "recipe): per-source token shares re-tempered with alpha = 0.5 "
        "(share ∝ sqrt(tokens), renormalized) and surfaced as sampling "
        "weights target/current — upweights tail domains, downweights "
        "head domains. Parity: token counts are exact integers; sqrt is "
        "IEEE-correctly-rounded then quantized to 6 dp DECIMAL before "
        "the cross-engine sum (double summation order would drift); the "
        "final shares/weights are identical-ordered double ops. Scale: "
        "one partial-aggregated groupBy(source) to a domain-bounded "
        "table, one broadcast single-row total."
    ),
    tags=("text", "sampling", "llm-pipeline"),
)
def q_text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr("size(filter(split(text, ' '), t -> t <> ''))")).alias("tokens"),
    )
    sqrt6 = F.round(F.sqrt(F.col("tokens").cast("double")), 6).cast("decimal(28,6)")
    with_sqrt = per_src.withColumn("sqrt6", sqrt6)
    tot = with_sqrt.groupBy().agg(
        F.sum("tokens").alias("tot_tokens"), F.sum("sqrt6").alias("tot_sqrt")
    )
    cur_share = F.col("tokens").cast("double") / F.col("tot_tokens").cast("double")
    target_share = F.col("sqrt6").cast("double") / F.col("tot_sqrt").cast("double")
    return with_sqrt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.col("tokens").cast("bigint").alias("tokens"),
        cur_share.alias("cur_share"),
        target_share.alias("target_share"),
        F.round(target_share / cur_share, 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Length-proportional Poisson sampling + Horvitz-Thompson estimator
# ---------------------------------------------------------------------------

_HT_C = 400.0  # pi_i = min(1, n_chars / C); median n_chars ~ 306 => mixed pis
_HT_U_SPARK = (
    "cast(conv(substring(md5(concat('ht:', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_HT_U_DUCK = "CAST('0x' || md5('ht:' || CAST(doc_id AS VARCHAR))[1:15] AS BIGINT)"
_TWO60 = "1152921504606846976.0"


@register(
    "q_sample_horvitz_thompson",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS n_tok,
                   LEAST(1.0, CAST(n_chars AS DOUBLE) / {_HT_C}) AS pi,
                   CAST({_HT_U_DUCK} AS DOUBLE) / {_TWO60} AS u
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE u < pi) AS BIGINT) AS n_sampled,
               CAST(SUM(n_tok) AS BIGINT) AS true_tokens,
               CAST(SUM(CASE WHEN u < pi THEN
                        CAST(ROUND(n_tok / pi, 6) AS DECIMAL(28,6)) END)
                    AS DOUBLE) AS ht_tokens
        FROM base GROUP BY source
    """,
    doc=(
        "Unequal-probability (length-proportional) Poisson sampling with "
        "the Horvitz-Thompson total estimator: pi_i = min(1, n_chars/C), "
        "inclusion decided by a seeded md5 uniform (reproducible across "
        "engines and cluster sizes — never rand()), and the per-source "
        "token total re-estimated as sum(n_tok/pi_i) over the sample "
        "next to the true total — the audit a budgeted curation pass "
        "runs to check what its biased sample represents. Parity: "
        "HT contributions are quantized to 6 dp DECIMAL before the "
        "cross-engine sum. Scale: map-side expressions plus one "
        "partial-aggregated groupBy(source)."
    ),
    tags=("sampling", "statistics", "llm-pipeline"),
)
def q_sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.expr("size(filter(split(text, ' '), t -> t <> ''))").alias("n_tok"),
        F.least(F.lit(1.0), F.col("n_chars").cast("double") / F.lit(_HT_C)).alias(
            "pi"
        ),
        (F.expr(_HT_U_SPARK).cast("double") / F.expr(_TWO60)).alias("u"),
    )
    inc = F.col("u") < F.col("pi")
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(inc, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum("n_tok").cast("bigint").alias("true_tokens"),
        F.sum(
            F.when(
                inc,
                F.round(F.col("n_tok") / F.col("pi"), 6).cast("decimal(28,6)"),
            )
        )
        .cast("double")
        .alias("ht_tokens"),
    )


# ---------------------------------------------------------------------------
# Randomization (permutation) test
# ---------------------------------------------------------------------------

_PERM_R = 64  # deterministic reassignment replicates
_PERM_COIN_SPARK = (
    "cast(conv(substring(md5(concat('perm:', cast(rep as string), ':',"
    " cast(event_id as string))), 1, 15), 16, 10) as bigint) % 2"
)
_PERM_COIN_DUCK = (
    "CAST('0x' || md5('perm:' || CAST(rep AS VARCHAR) || ':'"
    " || CAST(event_id AS VARCHAR))[1:15] AS BIGINT) % 2"
)


@register(
    "q_stats_permutation_test",
    oracle=f"""
        WITH base AS (
            SELECT event_id, event_type, CAST(value AS DECIMAL(14,6)) AS vd
            FROM events WHERE event_type IN ('click', 'view')
        ),
        obs AS (
            SELECT ABS(
                CAST(SUM(CASE WHEN event_type = 'click' THEN vd END) AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                - CAST(SUM(CASE WHEN event_type = 'view' THEN vd END) AS DOUBLE)
                    / SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            ) AS obs_diff FROM base
        ),
        reps AS (
            SELECT r.rep, {_PERM_COIN_DUCK} AS side, b.vd
            FROM base b CROSS JOIN (SELECT UNNEST(range({_PERM_R})) AS rep) r
        ),
        rep_diff AS (
            SELECT rep, ABS(
                CAST(SUM(CASE WHEN side = 0 THEN vd END) AS DOUBLE)
                    / SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                - CAST(SUM(CASE WHEN side = 1 THEN vd END) AS DOUBLE)
                    / SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)
            ) AS diff FROM reps GROUP BY rep
        )
        SELECT ROUND(o.obs_diff, 6) AS obs_diff,
               CAST({_PERM_R} AS BIGINT) AS n_reps,
               CAST(SUM(CASE WHEN r.diff >= o.obs_diff THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ge,
               (1.0 + SUM(CASE WHEN r.diff >= o.obs_diff THEN 1 ELSE 0 END))
                   / (1.0 + {_PERM_R}) AS p_value
        FROM rep_diff r CROSS JOIN obs o
        GROUP BY o.obs_diff
    """,
    doc=(
        "Randomization test for the click-vs-view mean-value gap: 64 "
        "deterministic label reassignments (seeded md5 coin per (rep, "
        "event) — reproducible across engines and cluster sizes), each "
        "replicate's |mean difference| from ONE conditional-aggregation "
        "pass over an exploded rep dimension, p = (1+#{{|diff_r| >= "
        "|obs|}})/(R+1). Scale: the explode is a map-side 64x flatMap "
        "with partial aggregation before the shuffle, so shuffle volume "
        "is 2R rows per task regardless of corpus size; the observed "
        "row broadcasts."
    ),
    tags=("statistics", "aggregate"),
)
def q_stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = e.where(F.col("event_type").isin("click", "view")).select(
        "event_id", "event_type", F.col("value").cast("decimal(14,6)").alias("vd")
    )
    is_c = F.col("event_type") == "click"
    obs = base.groupBy().agg(
        F.abs(
            F.sum(F.when(is_c, F.col("vd"))).cast("double")
            / F.sum(F.when(is_c, 1).otherwise(0))
            - F.sum(F.when(~is_c, F.col("vd"))).cast("double")
            / F.sum(F.when(~is_c, 1).otherwise(0))
        ).alias("obs_diff")
    )
    reps = (
        base.select("event_id", "vd")
        .select(
            "event_id", "vd", F.explode(F.expr(f"sequence(0, {_PERM_R - 1})")).alias("rep")
        )
        .withColumn("side", F.expr(_PERM_COIN_SPARK))
    )
    s0 = F.col("side") == 0
    rep_diff = reps.groupBy("rep").agg(
        F.abs(
            F.sum(F.when(s0, F.col("vd"))).cast("double")
            / F.sum(F.when(s0, 1).otherwise(0))
            - F.sum(F.when(~s0, F.col("vd"))).cast("double")
            / F.sum(F.when(~s0, 1).otherwise(0))
        ).alias("diff")
    )
    ge = F.when(F.col("diff") >= F.col("obs_diff"), 1).otherwise(0)
    return (
        rep_diff.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff")
        .agg(
            F.sum(ge).cast("bigint").alias("n_ge"),
        )
        .select(
            F.round(F.col("obs_diff"), 6).alias("obs_diff"),
            F.lit(_PERM_R).cast("bigint").alias("n_reps"),
            "n_ge",
            (
                (F.lit(1.0) + F.col("n_ge").cast("double"))
                / F.lit(1.0 + _PERM_R)
            ).alias("p_value"),
        )
        .select("obs_diff", "n_reps", "n_ge", "p_value")
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg step-up FDR control
# ---------------------------------------------------------------------------

_BH_Q = 0.10  # FDR level


def _norm_p_steps(z_col: str) -> list[tuple[str, str]]:
    """(name, formula-template) steps computing the two-sided normal
    p-value from a z column — ONE template rendered into both engines'
    SQL so every double op has identical order (Abramowitz-Stegun
    26.2.17, |error| < 7.5e-8; Horner form, no pow; final 6 dp round
    absorbs any cross-libm exp ulp)."""
    return [
        ("x", f"ABS({z_col})"),
        ("t", "1.0 / (1.0 + 0.2316419 * x)"),
        ("pdf", "0.3989422804014327 * EXP(-0.5 * x * x)"),
        (
            "p",
            "ROUND(2.0 * pdf * t * (0.319381530 + t * (-0.356563782"
            " + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))), 6)",
        ),
    ]


@register(
    "q_stats_benjamini_hochberg",
    oracle=f"""
        WITH m AS (
            SELECT event_type, dayofweek(ts) AS dow,
                   COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(14,6))) AS s,
                   SUM(CAST(value AS DECIMAL(14,6))
                       * CAST(value AS DECIMAL(14,6))) AS ss
            FROM events GROUP BY event_type, dayofweek(ts)
        ),
        tot AS (
            SELECT *, SUM(n) OVER (PARTITION BY event_type) AS n_et,
                   SUM(s) OVER (PARTITION BY event_type) AS s_et,
                   SUM(ss) OVER (PARTITION BY event_type) AS ss_et
            FROM m
        ),
        z AS (
            SELECT event_type, dow, n,
                   ROUND((CAST(s AS DOUBLE) / n
                          - CAST(s_et - s AS DOUBLE) / (n_et - n))
                         / SQRT(
                             ROUND((CAST(ss AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                   / (n - 1.0), 6) / n
                             + ROUND((CAST(ss_et - ss AS DOUBLE)
                                      - CAST(s_et - s AS DOUBLE)
                                        * CAST(s_et - s AS DOUBLE) / (n_et - n))
                                     / (n_et - n - 1.0), 6) / (n_et - n)),
                         6) AS z
            FROM tot
        ),
        pz AS (
            SELECT event_type, dow, n, z,
                   {_norm_p_steps('z')[0][1].replace('x', 'ABS(z)')} AS x
            FROM z
        ),
        p1 AS (SELECT *, 1.0 / (1.0 + 0.2316419 * x) AS t,
                      0.3989422804014327 * EXP(-0.5 * x * x) AS pdf FROM pz),
        p2 AS (
            SELECT event_type, dow, n, z,
                   ROUND(2.0 * pdf * t * (0.319381530 + t * (-0.356563782
                       + t * (1.781477937 + t * (-1.821255978
                       + t * 1.330274429)))), 6) AS p
            FROM p1
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY event_type ORDER BY p ASC, dow ASC) AS i,
                      COUNT(*) OVER (PARTITION BY event_type) AS m
            FROM p2
        ),
        flagged AS (
            SELECT *, CASE WHEN p <= i * {_BH_Q} / m THEN i END AS hit
            FROM ranked
        )
        SELECT event_type, dow, n, z, p, CAST(i AS BIGINT) AS p_rank,
               CASE WHEN i <= COALESCE(
                        MAX(hit) OVER (PARTITION BY event_type), 0)
                    THEN TRUE ELSE FALSE END AS rejected
        FROM flagged
    """,
    doc=(
        "Benjamini-Hochberg step-up FDR control over a family of tests "
        "per event type: each day-of-week's mean value is Welch-z-tested "
        "against the type's other days (exact DECIMAL moments, variance "
        "rounded at definition — the welch_ttest discipline), two-sided "
        "normal p via the Abramowitz-Stegun 26.2.17 polynomial rendered "
        "as identical double ops in both engines, then within each "
        "family: rank ascending, compare to i*q/m, reject everything up "
        "to the largest passing rank. Scale: one conditional-aggregation "
        "pass to a (types x 7)-row table; every window partitions by "
        "event_type — the family — so nothing is global."
    ),
    tags=("statistics", "aggregate"),
)
def q_stats_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(14,6)")
    m = e.groupBy("event_type", (F.dayofweek("ts") - 1).alias("dow")).agg(
        F.count("*").alias("n"), F.sum(vd).alias("s"), F.sum(vd * vd).alias("ss")
    )
    w_et = Window.partitionBy("event_type")
    tot = (
        m.withColumn("n_et", F.sum("n").over(w_et))
        .withColumn("s_et", F.sum("s").over(w_et))
        .withColumn("ss_et", F.sum("ss").over(w_et))
    )
    nd = F.col("n").cast("double")
    nr = (F.col("n_et") - F.col("n")).cast("double")
    sd = F.col("s").cast("double")
    sr = (F.col("s_et") - F.col("s")).cast("double")
    ssd = F.col("ss").cast("double")
    ssr = (F.col("ss_et") - F.col("ss")).cast("double")
    var_d = F.round((ssd - sd * sd / nd) / (nd - F.lit(1.0)), 6)
    var_r = F.round((ssr - sr * sr / nr) / (nr - F.lit(1.0)), 6)
    z = tot.select(
        "event_type",
        "dow",
        "n",
        F.round(
            (sd / nd - sr / nr) / F.sqrt(var_d / nd + var_r / nr), 6
        ).alias("z"),
    )
    x = F.abs(F.col("z"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * x)
    pdf = F.lit(0.3989422804014327) * F.exp(F.lit(-0.5) * x * x)
    horner = F.lit(0.319381530) + t * (
        F.lit(-0.356563782)
        + t * (F.lit(1.781477937) + t * (F.lit(-1.821255978) + t * F.lit(1.330274429)))
    )
    p2 = z.withColumn("p", F.round(F.lit(2.0) * pdf * t * horner, 6))
    w_rank = Window.partitionBy("event_type").orderBy(F.col("p").asc(), F.col("dow").asc())
    ranked = p2.withColumn("i", F.row_number().over(w_rank)).withColumn(
        "m", F.count("*").over(w_et)
    )
    flagged = ranked.withColumn(
        "hit",
        F.when(
            F.col("p") <= F.col("i") * F.lit(_BH_Q) / F.col("m"), F.col("i")
        ),
    )
    return flagged.select(
        "event_type",
        "dow",
        "n",
        "z",
        "p",
        F.col("i").cast("bigint").alias("p_rank"),
        (
            F.col("i") <= F.coalesce(F.max("hit").over(w_et), F.lit(0))
        ).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Per-key rate limiting (throttling sample)
# ---------------------------------------------------------------------------

_RATE_M = 3  # events kept per (user, hour)


@register(
    "q_events_rate_limit",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_kept,
               CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS kept_value
        FROM ranked WHERE rn <= {_RATE_M}
        GROUP BY event_type
    """,
    doc=(
        "Per-key rate limiting: keep the first M=3 events per (user, "
        "hour) by event time (deterministic event_id tie-break) and "
        "report kept volume per type — the standard pre-aggregation "
        "gate that bounds any single key's contribution before "
        "downstream rollups (hot-key protection). Scale: the window "
        "partitions by (user, hour) so state per task is one key-group; "
        "WindowGroupLimit pushes the rn <= M filter below the sort "
        "at the exec level."
    ),
    tags=("events", "window", "sampling"),
)
def q_events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        "ts", "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RATE_M)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum(F.col("value").cast("decimal(14,6)"))
            .cast("double")
            .alias("kept_value"),
        )
    )


# ---------------------------------------------------------------------------
# Item-item Jaccard over the customer-part bipartite graph
# ---------------------------------------------------------------------------

_JAC_CAP = 40  # max parts per customer admitted to pair mining
_JAC_MIN_CO = 2  # minimum co-occurrence to emit a pair


@register(
    "q_graph_item_jaccard",
    oracle=f"""
        WITH cp AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        deg_c AS (
            SELECT c, COUNT(*) AS d FROM cp GROUP BY c
        ),
        capped AS (
            SELECT cp.c, cp.p FROM cp JOIN deg_c USING (c)
            WHERE d BETWEEN 2 AND {_JAC_CAP}
        ),
        item_deg AS (SELECT p, COUNT(*) AS dp FROM capped GROUP BY p),
        -- an item seen with < MIN_CO customers can never reach the
        -- co-occurrence floor: prune it BEFORE the self-join
        pruned AS (
            SELECT capped.c, capped.p FROM capped
            JOIN item_deg USING (p) WHERE dp >= {_JAC_MIN_CO}
        ),
        pairs AS (
            SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS co
            FROM pruned a JOIN pruned b ON a.c = b.c AND a.p < b.p
            GROUP BY a.p, b.p
            HAVING COUNT(*) >= {_JAC_MIN_CO}
        )
        SELECT pr.part_a, pr.part_b, pr.co,
               da.dp AS deg_a, db.dp AS deg_b,
               ROUND(CAST(pr.co AS DOUBLE) / (da.dp + db.dp - pr.co), 6)
                   AS jaccard
        FROM pairs pr
        JOIN item_deg da ON da.p = pr.part_a
        JOIN item_deg db ON db.p = pr.part_b
    """,
    doc=(
        "Item-item Jaccard similarity over the customer-part bipartite "
        "graph — recommender candidate generation ('customers who "
        "bought X also bought Y'): distinct customer-part edges, "
        "customers degree-capped at 40 (the standard co-occurrence "
        "bound: pair fan-out per customer is then <= cap^2, so the "
        "self-join can never go quadratic on a hub customer), pair "
        "counts from a customer-local equi-self-join, Jaccard against "
        "the capped-universe item degrees. Scale: everything keys on "
        "customer or part; the cap turns the worst-case hub blow-up "
        "into a constant; degree tables are partial-aggregated."
    ),
    tags=("graph", "similarity", "recommender"),
)
def q_graph_item_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"), "o_orderkey"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("p")
    )
    # NOT snapshotted (r11, measured): the printed plan re-plans this
    # distinct per reference (48 scans / 66 exchanges on paper), but
    # every branch ends at the IDENTICAL distinct exchange, so runtime
    # ReuseExchange executes it once — warm A/B read 3.4 s without
    # snapshots vs 4.8 s with (the checkpoint pays 600k-row
    # materialization for work the engine already dedupes)
    cp = o.join(l, o.o_orderkey == l.l_orderkey).select("c", "p").distinct()
    deg_c = cp.groupBy("c").agg(F.count("*").alias("d"))
    capped = (
        cp.join(deg_c, "c")
        .where(F.col("d").between(2, _JAC_CAP))
        .select("c", "p")
    )
    item_deg = capped.groupBy("p").agg(F.count("*").alias("dp"))
    # pair-space pre-filter (round-3 verdict #4): an item whose
    # capped-universe degree is below the co-occurrence floor cannot
    # appear in any surviving pair — semi-join it out BEFORE the
    # self-join so the quadratic phase runs on the dp >= MIN_CO slice
    pruned = capped.join(
        item_deg.where(F.col("dp") >= _JAC_MIN_CO).select("p"),
        "p",
        "left_semi",
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count("*").alias("co"))
        .where(F.col("co") >= _JAC_MIN_CO)
    )
    da = item_deg.select(F.col("p").alias("part_a"), F.col("dp").alias("deg_a"))
    db = item_deg.select(F.col("p").alias("part_b"), F.col("dp").alias("deg_b"))
    return (
        pairs.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "co",
            "deg_a",
            "deg_b",
            F.round(
                F.col("co").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("co")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Contrastive hard-negative mining inside trained IVF cells
# ---------------------------------------------------------------------------

_NEG_DUP_COS = 0.95  # cosine at/above this is a near-duplicate, not a negative
_NEG_K = 5


def _contrastive_oracle() -> str:
    from weather_flink_spark.plans.llm_extra import (
        IVF_N_QUERIES,
        _cos_duck,
        ivf_assigned_cte,
    )

    return f"""
        WITH {ivf_assigned_cte()},
        cand AS (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   {_cos_duck('q.embedding', 'v.embedding')} AS cosine
            FROM assigned q JOIN assigned v
              ON q.cell = v.cell AND q.vec_id <> v.vec_id
            WHERE q.vec_id < {IVF_N_QUERIES}
        ),
        neg AS (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id ASC) AS neg_rank
            FROM cand WHERE cosine < {_NEG_DUP_COS}
        )
        SELECT query_id, vec_id, cosine, neg_rank
        FROM neg WHERE neg_rank <= {_NEG_K}
    """


@register(
    "q_sim_contrastive_negatives",
    oracle=_contrastive_oracle(),
    doc=(
        "Hard-negative mining for contrastive training: for each query "
        "vector, the top-5 most similar IN-CELL vectors that are NOT "
        "near-duplicates (cosine < 0.95) — the 'hard but wrong' "
        "examples an embedding trainer pairs with positives. Rides the "
        "session-cached fixed-k IVF assignment (bounded broadcast "
        "query set, cell-local candidate scan) and composes its oracle "
        "from the shared assignment CTE so the centroid rule cannot "
        "drift from the other IVF consumers."
    ),
    tags=("similarity", "ann", "ivf", "llm-pipeline"),
)
def q_sim_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.llm_extra import IVF_N_QUERIES, ivf_assigned_table
    from weather_flink_spark.plans.llm_pipeline import dot_col

    assigned = ivf_assigned_table(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    cos_qv = dot_col(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        assigned.join(
            F.broadcast(q),
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos_qv.alias("cosine"))
        .where(F.col("cosine") < _NEG_DUP_COS)
        .withColumn("neg_rank", F.row_number().over(w_rank))
        .where(F.col("neg_rank") <= _NEG_K)
    )


# ---------------------------------------------------------------------------
# binaryFile source ingestion
# ---------------------------------------------------------------------------

_BF_MOD = 1_000_000_007
_BF_LINE_H_SPARK = (
    "cast(conv(substring(md5(line), 1, 15), 16, 10) as bigint)"
)
_BF_LINE_H_DUCK = "CAST('0x' || md5(text)[1:15] AS BIGINT)"


@register(
    "q_source_binaryfile_ingest",
    oracle=f"""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(text)) AS BIGINT) AS total_chars,
               CAST(SUM(CAST({_BF_LINE_H_DUCK} AS DECIMAL(38,0)))
                    % {_BF_MOD} AS BIGINT) AS digest_mod
        FROM documents GROUP BY source
    """,
    doc=(
        "Opaque-binary ingestion fidelity: documents written out as "
        "source-partitioned newline-delimited text files, re-read "
        "through Spark's binaryFile source (whole-file bytes + path "
        "metadata, partition discovery on source=), decoded UTF-8, "
        "line-split, and digest-aggregated per source with an order-"
        "insensitive modular digest sum — the oracle computes the same "
        "digest from the pristine parquet, so any byte lost or "
        "reordered in the write/read path breaks the hash. This is the "
        "ingestion shape for multimodal blobs (operators/multimodal.py): "
        "content stays an opaque binary column until a mapInPandas "
        "decoder touches it. Scale: binaryFile reads one file per task "
        "(files are the split unit), so the writer's partitioned many-"
        "file layout IS the read parallelism."
    ),
    tags=("source", "binary", "roundtrip", "multimodal"),
)
def q_source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        f"wfs_fmt_binaryfile_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}",
    )
    if os.path.exists(out):
        shutil.rmtree(out)
    d.select(F.col("text").alias("value"), "source").write.partitionBy(
        "source"
    ).mode("overwrite").text(out)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(out)
    )
    lines = back.select(
        "source",
        F.explode(
            F.expr("filter(split(decode(content, 'UTF-8'), '\\n'), l -> l <> '')")
        ).alias("line"),
    )
    return lines.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("line")).cast("bigint").alias("total_chars"),
        (
            F.sum(F.expr(_BF_LINE_H_SPARK).cast("decimal(38,0)")) % _BF_MOD
        )
        .cast("bigint")
        .alias("digest_mod"),
    )
