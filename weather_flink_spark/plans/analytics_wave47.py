"""Wave-47 operators (round 7): apriori triples, bitemporal as-of
join, boilerplate n-gram detection.

- ``q_orders_apriori_triples`` — frequent 3-itemsets over market
  baskets (Agrawal-Srikant level 3, extending q_basket_pairs_lift's
  pairs and q_orders_assoc_rules' directed rules): triples generated
  WITHIN-basket only (cubic in basket size, bounded by business
  reality, never corpus size) above a support floor, with the
  all-pairs-frequent apriori pruning property asserted in tests.
- ``q_join_bitemporal`` — the bitemporal AS OF join: a versioned
  dimension keyed by BOTH valid time (when the fact was true) and
  transaction time (when the warehouse learned it), probed at
  (as_of_valid, as_of_txn) — "what did we BELIEVE on T2 the customer
  tier was on T1", the audit-grade lookup one dimension beyond
  q_feature_pit_join's single-axis point-in-time join. Version rows
  derive deterministically from orders (per-customer order sequence =
  tier versions; txn time lags valid time by a fixed load delay);
  selection = lexicographic struct-MAX over qualifying versions (no
  window sort).
- ``q_text_boilerplate_ngrams`` — corpus-frequency boilerplate
  detection (the CCNet-style curation signal): a 3-gram occurring in
  >= K distinct docs of the SAME source is boilerplate; per doc, the
  fraction of its grams that are boilerplate and the keep/flag
  verdict. Complements q_text_suffix_dup_spans (pairwise span
  finding) with the corpus-frequency view; hash-blocked like every
  dedup op — no pairwise document work anywhere.

Parity discipline as plans/registry.py; reference parity note: the
reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot

_AP3_MIN_BASKET = 3
_AP3_MIN_SUPPORT = 2  # triple must appear in >= 2 baskets

_BT_LOAD_DELAY_DAYS = 2  # txn time = valid time + warehouse load lag
_BT_PROBE_CUSTS = 50

_BP_N = 3  # boilerplate gram width (tokens)
_BP_MIN_DOCS = 3  # gram in >= K distinct docs of a source => boilerplate


@register(
    "q_orders_apriori_triples",
    oracle=f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        sz AS (
            SELECT ok FROM op GROUP BY ok
            HAVING COUNT(*) >= {_AP3_MIN_BASKET}
        ),
        qual AS (
            SELECT a.ok, a.pk FROM op a JOIN sz USING (ok)
        ),
        triples AS (
            SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3
            FROM qual a
            JOIN qual b ON b.ok = a.ok AND b.pk > a.pk
            JOIN qual c ON c.ok = a.ok AND c.pk > b.pk
        )
        SELECT p1, p2, p3, COUNT(*) AS support
        FROM triples
        GROUP BY p1, p2, p3
        HAVING COUNT(*) >= {_AP3_MIN_SUPPORT}
    """,
    doc=(
        "Frequent 3-itemsets (Agrawal-Srikant apriori level 3): part "
        "triples co-purchased in >= 2 baskets, generated WITHIN-basket "
        "only (p1<p2<p3 over baskets of >= 3 parts — cubic in basket "
        "size, which business reality bounds, never in corpus size; "
        "the same blocked-pair discipline as the band joins, one level "
        "up). Pure integer counts. The apriori property (every "
        "sub-pair of a frequent triple is itself frequent at the same "
        "floor) is asserted in tests. Scale: rides the session-cached "
        "order-part edge table; the only shuffles are the basket-size "
        "semi-join and the triple groupBy."
    ),
    tags=("orders", "basket", "analytics"),
)
def q_orders_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_flink_spark.plans.analytics_wave4 import (
        order_part_edges_table,
    )

    op = order_part_edges_table(spark, sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    sz = op.groupBy("ok").count().filter(
        F.col("count") >= _AP3_MIN_BASKET
    ).select("ok")
    # snapshot the qualified basket slice: the 3-way self-join below
    # references it once per side, re-planning the size-filter join
    # each time without it (r11)
    qual = op.join(sz, "ok").transform(snapshot(eager=False))
    a, b, c = qual.alias("a"), qual.alias("b"), qual.alias("c")
    triples = (
        a.join(
            b,
            (F.col("b.ok") == F.col("a.ok"))
            & (F.col("b.pk") > F.col("a.pk")),
        )
        .join(
            c,
            (F.col("c.ok") == F.col("a.ok"))
            & (F.col("c.pk") > F.col("b.pk")),
        )
        .select(
            F.col("a.pk").alias("p1"),
            F.col("b.pk").alias("p2"),
            F.col("c.pk").alias("p3"),
        )
    )
    return (
        triples.groupBy("p1", "p2", "p3")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _AP3_MIN_SUPPORT)
    )


@register(
    "q_join_bitemporal",
    oracle=f"""
        WITH versions AS (
            -- per-customer order sequence = tier version history:
            -- valid_from = order date, tier = version ordinal,
            -- txn_from = valid_from + fixed load delay
            SELECT o_custkey AS custkey,
                   o_orderdate AS valid_from,
                   o_orderdate + INTERVAL {_BT_LOAD_DELAY_DAYS} DAY
                       AS txn_from,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC) AS tier
            FROM orders
        ),
        probes AS (
            -- audit question per customer: what did we BELIEVE on
            -- txn-axis T2 = last txn_from, the tier was on valid-axis
            -- T1 = the MIDPOINT valid date
            SELECT custkey,
                   MIN(valid_from)
                       + CAST(FLOOR(DATEDIFF('day', MIN(valid_from),
                                             MAX(valid_from)) / 2)
                              AS BIGINT) * INTERVAL 1 DAY AS as_of_valid,
                   MAX(txn_from) AS as_of_txn
            FROM versions
            GROUP BY custkey
            HAVING custkey < {_BT_PROBE_CUSTS}
        )
        SELECT p.custkey, p.as_of_valid, p.as_of_txn,
               MAX(struct_pack(valid_from := v.valid_from,
                               tier := v.tier)).valid_from AS valid_from,
               MAX(struct_pack(valid_from := v.valid_from,
                               tier := v.tier)).tier AS tier
        FROM probes p
        JOIN versions v
          ON v.custkey = p.custkey
         AND v.valid_from <= p.as_of_valid
         AND v.txn_from <= p.as_of_txn
        GROUP BY p.custkey, p.as_of_valid, p.as_of_txn
    """,
    doc=(
        "Bitemporal AS OF join: a dimension versioned on BOTH valid "
        "time and transaction time (versions derived deterministically "
        "from each customer's order sequence; txn lags valid by a "
        "2-day load delay), probed at (as_of_valid = midpoint date, "
        "as_of_txn = latest load) — 'what did we BELIEVE on T2 was "
        "true on T1', the audit-grade two-axis lookup one dimension "
        "beyond q_feature_pit_join. Selection is a lexicographic "
        "struct-MAX over qualifying versions (argmax by valid_from "
        "with the deterministic tier tie-break) — one aggregate, no "
        "per-probe window sort. Scale: the version/probe join is "
        "customer-keyed; at 100 TB it is the same shuffle a SCD2 "
        "point-in-time enrichment pays, with the qualifying-version "
        "range bounded per key."
    ),
    tags=("join", "temporal", "scd"),
)
def q_join_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    versions = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.date_add(F.col("o_orderdate"), _BT_LOAD_DELAY_DAYS).alias(
            "txn_from"
        ),
        F.row_number().over(w).alias("tier"),
    )
    probes = (
        versions.groupBy("custkey")
        .agg(
            F.min("valid_from").alias("v0"),
            F.max("valid_from").alias("v1"),
            F.max("txn_from").alias("as_of_txn"),
        )
        .filter(F.col("custkey") < _BT_PROBE_CUSTS)
        .select(
            "custkey",
            F.expr(
                "date_add(v0, CAST(floor(datediff(v1, v0) / 2) AS INT))"
            ).alias("as_of_valid"),
            "as_of_txn",
        )
    )
    v = versions.alias("v")
    p = probes.alias("p")
    joined = p.join(
        v,
        (F.col("v.custkey") == F.col("p.custkey"))
        & (F.col("v.valid_from") <= F.col("p.as_of_valid"))
        & (F.col("v.txn_from") <= F.col("p.as_of_txn")),
    )
    pick = F.max(F.struct(F.col("v.valid_from"), F.col("v.tier"))).alias(
        "sel"
    )
    return (
        joined.groupBy(
            F.col("p.custkey").alias("custkey"),
            F.col("p.as_of_valid").alias("as_of_valid"),
            F.col("p.as_of_txn").alias("as_of_txn"),
        )
        .agg(pick)
        .select(
            "custkey",
            "as_of_valid",
            "as_of_txn",
            F.col("sel.valid_from").alias("valid_from"),
            F.col("sel.tier").alias("tier"),
        )
    )


@register(
    "q_text_boilerplate_ngrams",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split(lower(text), ' ') AS tok
            FROM documents
        ),
        grams AS (
            SELECT doc_id, source,
                   array_to_string(tok[CAST(i AS INTEGER):
                                       CAST(i + {_BP_N} - 1 AS INTEGER)],
                                   ' ') AS gram
            FROM toks,
                 UNNEST(range(1, GREATEST(len(tok) - {_BP_N} + 2, 1)))
                     AS t(i)
            WHERE len(tok) >= {_BP_N}
        ),
        bp AS (
            SELECT source, gram
            FROM (SELECT DISTINCT source, gram, doc_id FROM grams)
            GROUP BY source, gram
            HAVING COUNT(*) >= {_BP_MIN_DOCS}
        )
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(b.gram) AS BIGINT) AS n_boiler,
               ROUND(CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*), 6)
                   AS boiler_frac,
               COUNT(b.gram) * 2 >= COUNT(*) AS flagged
        FROM grams g
        LEFT JOIN bp b ON b.source = g.source AND b.gram = g.gram
        GROUP BY g.doc_id
    """,
    doc=(
        "Corpus-frequency boilerplate detection (the CCNet-style "
        "curation signal): a 3-token gram occurring in >= 3 distinct "
        "docs of the SAME source is boilerplate; per doc, the gram "
        "count, boilerplate-gram count, fraction, and the >= 50% "
        "flag a curation pipeline drops on. Complements "
        "q_text_suffix_dup_spans (pairwise span finding) with the "
        "corpus-frequency view. Scale: explode to grams, ONE "
        "(source, gram) groupBy for the boilerplate set, one gram-"
        "keyed join back — hash-blocked like every dedup op, no "
        "pairwise document work; integer counts, one division."
    ),
    tags=("text", "quality", "dedup", "llm-pipeline"),
)
def q_text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("tok")
    )
    grams = (
        d.filter(F.size("tok") >= _BP_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.size("tok") - F.lit(_BP_N)
                    ),
                    lambda i: F.array_join(
                        F.slice(F.col("tok"), i + 1, _BP_N), " "
                    ),
                )
            ).alias("gram"),
        )
    )
    bp = (
        grams.select("source", "gram", "doc_id")
        .distinct()
        .groupBy("source", "gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _BP_MIN_DOCS)
        .select("source", "gram")
    )
    hit = grams.join(
        bp.withColumnRenamed("gram", "b_gram").withColumnRenamed(
            "source", "b_source"
        ),
        (F.col("source") == F.col("b_source"))
        & (F.col("gram") == F.col("b_gram")),
        "left",
    )
    return hit.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.count("b_gram").cast("bigint").alias("n_boiler"),
        F.round(
            F.count("b_gram").cast("double") / F.count("*"), 6
        ).alias("boiler_frac"),
        (F.count("b_gram") * 2 >= F.count("*")).alias("flagged"),
    )
