"""Empirical scaling probe: run key plan shapes at 1× and 10× sf0.1.

The 10× inputs are built in memory by unioning shifted copies (keys
offset per copy so join fan-out stays realistic), so the probe needs no
extra testdata. Reported per shape: wall at 1×, wall at 10×, and the
scale factor — linear-ish factors (≈10, minus fixed overhead) are the
evidence that the plan survives growth; anything super-linear is a
red flag.

Shapes probed (the map of SCALE.md sections):
- scan→filter→aggregate (TPC-H Q1 shape)
- fact⋈fact shuffle join + aggregate
- MinHash signature-table build (the linear phase of near-dedup; the
  pair phase scales with duplicate structure, not corpus size)
- brute-force cosine top-k (scan-linear per query)

Usage: python tools/scaling_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from weather_flink_spark.io import load  # noqa: E402
from weather_flink_spark.session import get_spark  # noqa: E402


def scaled(df: DataFrame, key_cols: list[str], copies: int, key_stride: int) -> DataFrame:
    parts = []
    for i in range(copies):
        part = df
        for k in key_cols:
            part = part.withColumn(k, F.col(k) + F.lit(i * key_stride))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated substrings; run only matching shapes "
        "(a full run re-measures 31 shapes to add one — this skips "
        "the rest)",
    )
    args = ap.parse_args()
    only = [s.strip() for s in args.only.split(",")] if args.only else None

    def want(name: str) -> bool:
        return only is None or any(sub in name for sub in only)
    spark = get_spark("scaling-probe")
    K = args.copies
    STRIDE = 10_000_000

    li, orders = load(spark, args.sf, "lineitem"), load(spark, args.sf, "orders")
    docs, emb = load(spark, args.sf, "documents"), load(spark, args.sf, "embeddings")
    li.count()  # warm

    results = {}

    def q1(df):
        return (
            df.filter(F.col("l_quantity") > 10)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
            .count()
        )

    results["scan_filter_agg"] = want("scan_filter_agg") and {
        "x1": timed(lambda: q1(li)),
        "xN": timed(lambda: q1(scaled(li, ["l_orderkey"], K, STRIDE))),
    }

    def join_agg(l, o):
        return (
            l.join(o.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"), "l_orderkey")
            .groupBy("l_returnflag")
            .agg(F.count("*"), F.sum("o_totalprice"))
            .count()
        )

    results["fact_join_agg"] = want("fact_join_agg") and {
        "x1": timed(lambda: join_agg(li, orders)),
        "xN": timed(
            lambda: join_agg(
                scaled(li, ["l_orderkey"], K, STRIDE), scaled(orders, ["o_orderkey"], K, STRIDE)
            )
        ),
    }

    def sig_build(d):
        from weather_flink_spark.plans.llm_pipeline import _shingle_table

        t = _shingle_table(d)
        n = t.count()
        t.unpersist()
        return n

    results["minhash_signatures"] = want("minhash_signatures") and {
        "x1": timed(lambda: sig_build(docs)),
        "xN": timed(lambda: sig_build(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    def topk(e):
        from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col
        from pyspark.sql import Window

        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        cosine = dot_col(F.col("q_emb"), F.col("embedding")) / (
            norm_col(F.col("q_emb")) * norm_col(F.col("embedding"))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        return (
            joined.select("query_id", "vec_id", cosine.alias("cosine"))
            .withColumn("k_rank", F.row_number().over(w))
            .filter(F.col("k_rank") <= 10)
            .count()
        )

    results["cosine_topk_bruteforce"] = want("cosine_topk_bruteforce") and {
        "x1": timed(lambda: topk(emb)),
        "xN": timed(lambda: topk(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def cdc_merge(e):
        from pyspark.sql import Window

        cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

        def latest(df):
            return (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "ts", "event_type", "value")
            )

        base = latest(e.filter(F.col("ts") < cutoff)).alias("b")
        delta = latest(e.filter(F.col("ts") >= cutoff)).alias("d")
        return base.join(
            delta, F.col("b.user_id") == F.col("d.user_id"), "full_outer"
        ).count()

    events = load(spark, args.sf, "events")
    results["cdc_merge_upsert"] = want("cdc_merge_upsert") and {
        "x1": timed(lambda: cdc_merge(events)),
        "xN": timed(lambda: cdc_merge(scaled(events, ["user_id", "event_id"], K, STRIDE))),
    }

    def triangles(l):
        items = l.select("l_orderkey", "l_partkey").dropDuplicates()
        a, b = items.alias("a"), items.alias("b")
        pairs = a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        edges = (
            pairs.groupBy("p1", "p2").agg(F.count("*").alias("s")).filter(F.col("s") >= 2)
        ).select("p1", "p2").persist()
        e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
        n = (
            e1.join(F.broadcast(e2), F.col("e2.p1") == F.col("e1.p2"))
            .join(
                F.broadcast(e3),
                (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
            )
            .count()
        )
        edges.unpersist()
        return n

    # scale orders only (keys shift) — baskets keep their size, so the
    # pair space grows linearly with orders, not quadratically
    results["triangle_count"] = want("triangle_count") and {
        "x1": timed(lambda: triangles(li)),
        "xN": timed(lambda: triangles(scaled(li, ["l_orderkey"], K, STRIDE))),
    }

    def kmeans_iter(e):
        from weather_flink_spark.plans.analytics_wave4 import (
            KMEANS_K,
            _kmeans_dist_col,
        )
        from pyspark.sql import Window

        cent = e.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
        d2 = _kmeans_dist_col("embedding", "c")
        w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
        assigned = (
            e.crossJoin(F.broadcast(cent))
            .select("vec_id", "embedding", "cid", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        return (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "comp"))
            .groupBy("cid", "pos")
            .agg(F.sum(F.col("comp").cast("double").cast("decimal(18,9)")))
            .count()
        )

    results["kmeans_one_iteration"] = want("kmeans_one_iteration") and {
        "x1": timed(lambda: kmeans_iter(emb)),
        "xN": timed(lambda: kmeans_iter(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def paragraph_dedup(d):
        tok = d.select(
            "doc_id", F.expr("filter(split(text, ' '), t -> t <> '')").alias("tok")
        )
        chunks = tok.where("size(tok) >= 8").select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, cast(size(tok) / 8 as int) - 1),"
                    " k -> md5(array_join(slice(tok, k * 8 + 1, 8), ' ')))"
                )
            ).alias("ch"),
        )
        shared = (
            chunks.groupBy("ch")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") >= 2)
            .select("ch", F.lit(1).alias("is_shared"))
        )
        return (
            chunks.join(F.broadcast(shared), "ch", "left")
            .groupBy("doc_id")
            .agg(F.count("*"), F.count("is_shared"))
            .count()
        )

    # doc_id shifts per copy, so copies duplicate CONTENT across new ids —
    # the worst case for the shared-set size (it grows with copies)
    results["paragraph_dedup"] = want("paragraph_dedup") and {
        "x1": timed(lambda: paragraph_dedup(docs)),
        "xN": timed(lambda: paragraph_dedup(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    def semantic_cells(e):
        from weather_flink_spark.plans.registry import all_specs  # late: avoid cycles
        from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col
        from pyspark.sql import Window

        ev = e.select("vec_id", "embedding", norm_col(F.col("embedding")).alias("nrm"))
        cent = ev.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
        cos_vc = dot_col(F.col("embedding"), F.col("cent_emb")) / (
            F.col("nrm") * F.col("cent_nrm")
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("cc").desc(), F.col("cent_id"))
        assigned = (
            ev.join(F.broadcast(cent))
            .select("vec_id", "embedding", "nrm", "cent_id", cos_vc.alias("cc"))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("vec_id", "embedding", "nrm", F.col("cent_id").alias("cell"))
            .persist()
        )
        a, b = assigned.alias("a"), assigned.alias("b")
        cos_ab = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        n = (
            a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(cos_ab.alias("cos"))
            .filter("cos >= 0.30")
            .count()
        )
        assigned.unpersist()
        return n

    # centroid count grows with the corpus (stride-based), so cell size
    # stays ~constant and within-cell pair work grows LINEARLY — the
    # SemDeDup scale property this probe exists to demonstrate
    results["semantic_dedup_cells"] = want("semantic_dedup_cells") and {
        "x1": timed(lambda: semantic_cells(emb)),
        "xN": timed(lambda: semantic_cells(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def semantic_cells_hier(e):
        """Two-level (coarse→fine) IVF assignment: per-vector distance
        evals drop from k to |coarse| + k/|coarse| — the mitigation for
        the flat probe's super-linear assignment phase."""
        from weather_flink_spark.plans.llm_pipeline import dot_col, norm_col
        from pyspark.sql import Window

        ev = e.select("vec_id", "embedding", norm_col(F.col("embedding")).alias("nrm"))
        coarse = ev.filter(F.col("vec_id") % 1000 == 0).select(
            F.col("vec_id").alias("co_id"),
            F.col("embedding").alias("co_emb"),
            F.col("nrm").alias("co_nrm"),
        )
        fine = ev.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("fi_id"),
            F.col("embedding").alias("fi_emb"),
            F.col("nrm").alias("fi_nrm"),
        )

        def nearest(df, id_in, emb_in, nrm_in, cand, cid, cemb, cnrm, out):
            cos = dot_col(F.col(emb_in), F.col(cemb)) / (F.col(nrm_in) * F.col(cnrm))
            w = Window.partitionBy(id_in).orderBy(F.col("__c").desc(), F.col(cid))
            return (
                df.join(F.broadcast(cand))
                .withColumn("__c", cos)
                .withColumn("__r", F.row_number().over(w))
                .filter("__r = 1")
                .drop("__c", "__r", cemb, cnrm)
                .withColumnRenamed(cid, out)
            )

        # fine centroids pre-assigned to their coarse cell (tiny × small)
        fine_assigned = nearest(
            fine, "fi_id", "fi_emb", "fi_nrm", coarse, "co_id", "co_emb", "co_nrm", "co"
        )
        # vectors: nearest coarse, then nearest fine WITHIN that coarse cell
        v_coarse = nearest(
            ev, "vec_id", "embedding", "nrm", coarse, "co_id", "co_emb", "co_nrm", "co"
        )
        cos_vf = dot_col(F.col("embedding"), F.col("fi_emb")) / (
            F.col("nrm") * F.col("fi_nrm")
        )
        w2 = Window.partitionBy("vec_id").orderBy(F.col("__c").desc(), F.col("fi_id"))
        assigned = (
            v_coarse.join(F.broadcast(fine_assigned), "co")
            .withColumn("__c", cos_vf)
            .withColumn("__r", F.row_number().over(w2))
            .filter("__r = 1")
            .select("vec_id", "embedding", "nrm", F.col("fi_id").alias("cell"))
            .persist()
        )
        a, b = assigned.alias("a"), assigned.alias("b")
        cos_ab = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        n = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(cos_ab.alias("cos"))
            .filter("cos >= 0.30")
            .count()
        )
        assigned.unpersist()
        return n

    results["semantic_dedup_hierarchical"] = want("semantic_dedup_hierarchical") and {
        "x1": timed(lambda: semantic_cells_hier(emb)),
        "xN": timed(lambda: semantic_cells_hier(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def _fixedk_assigned(e):
        """The PRODUCTION assignment shape (round-3): train k-means with
        a FIXED k (seeds = first 8 vec_ids, 2 Lloyd rounds), then assign
        every vector — O(n·k·iters) end to end with a k-row broadcast
        model, the linear-in-n replacement for the stride-derived
        centroid set whose k grew with the corpus."""
        from weather_flink_spark.plans.analytics_wave4 import (
            KMEANS_ITERS,
            KMEANS_K,
            _kmeans_assign,
            _kmeans_recompute,
        )
        from weather_flink_spark.plans.llm_pipeline import norm_col

        cent = e.filter(F.col("vec_id") < KMEANS_K).select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
        for _ in range(KMEANS_ITERS):
            cent = _kmeans_recompute(_kmeans_assign(e, cent))
        return _kmeans_assign(e, cent).select(
            "vec_id",
            "embedding",
            norm_col(F.col("embedding")).alias("nrm"),
            F.col("cid").alias("cell"),
        )

    def ivf_assignment_fixedk(e):
        return _fixedk_assigned(e).count()

    # the round-2 verdict's "done" gate: assignment factor ~linear in n
    # (was ~10x super-linear for the stride-based centroid rule)
    results["ivf_assignment_fixedk"] = want("ivf_assignment_fixedk") and {
        "x1": timed(lambda: ivf_assignment_fixedk(emb)),
        "xN": timed(lambda: ivf_assignment_fixedk(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def semantic_cells_fixedk_bounded(e):
        """Production SemDeDup pair phase: fixed-k trained cells refined
        by operators/semdedup.bounded_cells, so per-cell pair work is
        bound²-capped even though fixed k makes raw cell size ∝ n."""
        from weather_flink_spark.operators.semdedup import bounded_cells
        from weather_flink_spark.plans.llm_pipeline import dot_col

        assigned = bounded_cells(_fixedk_assigned(e)).persist()
        a, b = assigned.alias("a"), assigned.alias("b")
        cos_ab = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        n = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(cos_ab.alias("cos"))
            .filter("cos >= 0.30")
            .count()
        )
        assigned.unpersist()
        return n

    results["semantic_dedup_fixedk_bounded"] = want("semantic_dedup_fixedk_bounded") and {
        "x1": timed(lambda: semantic_cells_fixedk_bounded(emb)),
        "xN": timed(
            lambda: semantic_cells_fixedk_bounded(scaled(emb, ["vec_id"], K, STRIDE))
        ),
    }

    def pca_gramian(e):
        from weather_flink_spark.operators.pca import gramian_stats

        n, s, g = gramian_stats(e, "embedding", dim=64)
        return n

    # linear map phase + fixed-size (d²) reduce: factor should track the
    # row count, never the d² reduction
    results["pca_gramian"] = want("pca_gramian") and {
        "x1": timed(lambda: pca_gramian(emb)),
        "xN": timed(lambda: pca_gramian(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    def suffix_dup_spans(d):
        # probe-local mirror of plans/analytics_wave9.q_text_suffix_dup_spans;
        # copying the corpus makes EVERY gram corpus-duplicated, so this
        # probes the worst case where the dup set covers all positions
        from weather_flink_spark.plans.analytics_wave9 import _SPAN_GH_SPARK, _SPAN_K
        from pyspark.sql import Window

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
        return isl.groupBy("doc_id", "island").count().count()

    results["suffix_dup_spans"] = want("suffix_dup_spans") and {
        "x1": timed(lambda: suffix_dup_spans(docs)),
        "xN": timed(lambda: suffix_dup_spans(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    def item_jaccard(o, l):
        # probe-local mirror of plans/analytics_wave9.q_graph_item_jaccard:
        # the degree cap turns hub-customer pair fan-out into a constant,
        # so pair volume grows with customers (linear), never degree^2
        cp = (
            o.select(F.col("o_custkey").alias("c"), "o_orderkey")
            .join(l.select("l_orderkey", F.col("l_partkey").alias("p")),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .select("c", "p")
            .distinct()
        )
        deg = cp.groupBy("c").agg(F.count("*").alias("d"))
        capped = cp.join(deg, "c").where(F.col("d").between(2, 40)).select("c", "p")
        # round-4: min-co pre-filter — items below the co-occurrence
        # floor leave the pair space before the self-join
        hot = (
            capped.groupBy("p")
            .agg(F.count("*").alias("dp"))
            .where(F.col("dp") >= 2)
            .select("p")
        )
        pruned = capped.join(hot, "p", "left_semi")
        a, b = pruned.alias("a"), pruned.alias("b")
        return (
            a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p"), F.col("b.p"))
            .count()
            .count()
        )

    # scale customers (not parts): pair volume must track customer count
    results["item_jaccard_degcapped"] = want("item_jaccard_degcapped") and {
        "x1": timed(lambda: item_jaccard(orders, li)),
        "xN": timed(
            lambda: item_jaccard(
                scaled(orders, ["o_custkey", "o_orderkey"], K, STRIDE),
                scaled(li, ["l_orderkey"], K, STRIDE),
            )
        ),
    }

    def adamic_adar(l):
        # probe-local mirror of plans/analytics_wave14.q_graph_adamic_adar:
        # within-order wedge join (quadratic only in basket size) with the
        # same min-co pre-filter before the self-join
        op = l.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
        sz = (
            op.groupBy("ok")
            .agg(F.count("*").alias("basket"))
            .where(F.col("basket") >= 3)
            .select(
                "ok",
                F.round(F.lit(1.0) / F.log("basket"), 6)
                .cast("decimal(10,6)")
                .alias("w6"),
            )
        )
        qual = op.join(sz, "ok")
        hot = (
            qual.groupBy("pk")
            .agg(F.count("*").alias("dp"))
            .where(F.col("dp") >= 2)
            .select("pk")
        )
        pruned = qual.join(hot, "pk", "left_semi")
        a = pruned.select("ok", F.col("pk").alias("p1"), "w6")
        b = pruned.select(F.col("ok").alias("ok2"), F.col("pk").alias("p2"))
        return (
            a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("p1") < F.col("p2")))
            .groupBy("p1", "p2")
            .agg(F.count("*").alias("n_co"), F.sum("w6").alias("aa"))
            .where(F.col("n_co") >= 2)
            .count()
        )

    # scale orders: wedge volume must track order count (baskets bounded)
    results["adamic_adar_minco_prefiltered"] = want("adamic_adar_minco_prefiltered") and {
        "x1": timed(lambda: adamic_adar(li)),
        "xN": timed(lambda: adamic_adar(scaled(li, ["l_orderkey"], K, STRIDE))),
    }

    def graph_ann_phases(e):
        """Round-4 probe: graph-ANN index build + beam search, timed as
        separate phases (probe-local mirror of plans/analytics_wave20.
        q_sim_ann_graph). The edge INDEX rides bounded cells (cap²-
        capped in-cell ranking → linear build, same machinery as the
        SemDeDup pair phase); the SEARCH is per-query bounded — beam ×
        (1+degree) rows per hop regardless of corpus size — so its
        factor should be ~flat even at 10× data."""
        from weather_flink_spark.operators.semdedup import bounded_cells
        from weather_flink_spark.plans.llm_pipeline import dot_col
        from pyspark.sql import Window

        assigned = bounded_cells(_fixedk_assigned(e)).persist()
        assigned.count()

        def build_edges():
            a, b = assigned.alias("a"), assigned.alias("b")
            cos_ab = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
                F.col("a.nrm") * F.col("b.nrm")
            )
            w_knn = Window.partitionBy("src").orderBy(
                F.col("cosine").desc(), F.col("dst").asc()
            )
            res = (
                a.join(
                    b,
                    (F.col("b.cell") == F.col("a.cell"))
                    & (F.col("b.vec_id") != F.col("a.vec_id")),
                )
                .select(
                    F.col("a.vec_id").alias("src"),
                    F.col("b.vec_id").alias("dst"),
                    cos_ab.alias("cosine"),
                )
                .withColumn("rk", F.row_number().over(w_knn))
                .filter(F.col("rk") <= 4)
                .select("src", "dst")
                .persist()
            )
            res.count()
            return res

        t_build = timed(build_edges)
        edges = build_edges()  # persisted twin for the search phase

        def search():
            q = e.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
            )
            # entries: one per coarse cell of the FIXED-k model (k rows)
            w_e = Window.partitionBy(F.col("cell")).orderBy(F.col("vec_id").asc())
            entries = (
                assigned.withColumn("rk", F.row_number().over(w_e))
                .filter("rk = 1")
                .select(F.col("vec_id").alias("node"))
            )
            emb_n = assigned.select(
                F.col("vec_id").alias("node"), "embedding", "nrm"
            )
            cos_qn = dot_col(F.col("q_emb"), F.col("embedding")) / (
                F.sqrt(
                    F.aggregate(
                        "q_emb",
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"),
                    )
                )
                * F.col("nrm")
            )
            frontier = (
                q.crossJoin(F.broadcast(entries))
                .join(emb_n, "node")
                .select("query_id", "q_emb", "node", cos_qn.alias("cosine"))
            )
            w_beam = Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("node").asc()
            )
            visited = frontier.select("query_id", "node", "cosine")
            for _ in range(3):
                expanded = (
                    frontier.join(edges, frontier.node == edges.src)
                    .select("query_id", "q_emb", F.col("dst").alias("node"))
                    .join(emb_n, "node")
                    .select("query_id", "q_emb", "node", cos_qn.alias("cosine"))
                    .unionByName(frontier)
                    .dropDuplicates(["query_id", "node"])
                )
                frontier = (
                    expanded.withColumn("rk", F.row_number().over(w_beam))
                    .filter("rk <= 4")
                    .drop("rk")
                    .localCheckpoint(eager=True)
                )
                visited = visited.unionByName(
                    expanded.select("query_id", "node", "cosine")
                ).dropDuplicates(["query_id", "node"])
            n = (
                visited.withColumn("rk", F.row_number().over(w_beam))
                .filter("rk <= 5")
                .count()
            )
            return n

        t_search = timed(search)
        edges.unpersist()
        assigned.unpersist()
        return t_build, t_search

    if want("graph_ann_index_build") or want("graph_ann_beam_search"):
        b1, s1 = graph_ann_phases(emb)
        bN, sN = graph_ann_phases(scaled(emb, ["vec_id"], K, STRIDE))
        results["graph_ann_index_build"] = {"x1": b1, "xN": bN}
        results["graph_ann_beam_search"] = {"x1": s1, "xN": sN}

    def ivfpq_adc(e):
        """Round-4 probe: IVF+PQ ADC scan (probe-local mirror of
        plans/analytics_wave15.q_sim_ann_ivfpq). The code table is the
        persisted index (built outside the timer in the registered
        plan's session cache; timed here as one linear map), the ADC
        phase reads 4 one-byte codes per candidate against a broadcast
        queries×subspaces×16 LUT, and the exact re-rank touches only
        the top-15 shortlist — everything is either scan-linear or
        query-bounded."""
        from pyspark.sql import Window

        # 4 subspaces × 16 codewords from the first 16 vectors (stand-in
        # codebook: the probe times the SCAN shape, not training quality)
        sub = 4
        cb = e.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("code"), "embedding"
        )
        codes = e.select("vec_id", "embedding")
        for s in range(sub):
            lo, width = s * 16 + 1, 16
            cb_s = cb.select(
                "code",
                F.slice("embedding", lo, width).alias(f"cb{s}"),
            )
            d2 = F.aggregate(
                F.zip_with(
                    F.slice("embedding", lo, width),
                    F.col(f"cb{s}"),
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            w_s = Window.partitionBy("vec_id").orderBy(
                F.col("d2").asc(), F.col("code").asc()
            )
            codes = (
                codes.crossJoin(F.broadcast(cb_s))
                .withColumn("d2", d2)
                .withColumn("rn", F.row_number().over(w_s))
                .filter("rn = 1")
                .drop("d2", "rn", f"cb{s}")
                .withColumnRenamed("code", f"c{s}")
            )
        code_tab = codes.select(
            "vec_id", *[f"c{s}" for s in range(sub)]
        ).persist()
        n_codes = code_tab.count()

        # ADC: broadcast LUT (queries × sub × 16 distances), sum 4 lookups
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        lut_rows = []
        for s in range(sub):
            lo, width = s * 16 + 1, 16
            d2q = F.aggregate(
                F.zip_with(
                    F.slice("q_emb", lo, width),
                    F.slice("embedding", lo, width),
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            lut_rows.append(
                q.crossJoin(cb.select(F.col("code"), "embedding"))
                .select(
                    "query_id",
                    F.lit(s).alias("sub"),
                    "code",
                    d2q.alias("d2"),
                )
            )
        lut = lut_rows[0]
        for r in lut_rows[1:]:
            lut = lut.unionByName(r)
        lut = lut.persist()
        lut.count()

        def adc_scan():
            cand = code_tab.crossJoin(
                F.broadcast(q.select("query_id"))
            )
            for s in range(sub):
                l_s = lut.filter(F.col("sub") == s).select(
                    "query_id", F.col("code").alias(f"c{s}"), F.col("d2").alias(f"d{s}")
                )
                cand = cand.join(F.broadcast(l_s), ["query_id", f"c{s}"])
            adc = cand.select(
                "query_id",
                "vec_id",
                sum([F.col(f"d{s}") for s in range(sub)], F.lit(0.0)).alias("adc_d2"),
            )
            w_q = Window.partitionBy("query_id").orderBy(
                F.col("adc_d2").asc(), F.col("vec_id").asc()
            )
            return (
                adc.withColumn("rk", F.row_number().over(w_q))
                .filter("rk <= 15")
                .count()
            )

        t_scan = timed(adc_scan)
        code_tab.unpersist()
        lut.unpersist()
        return t_scan

    results["ivfpq_adc_scan"] = want("ivfpq_adc_scan") and {
        "x1": ivfpq_adc(emb),
        "xN": ivfpq_adc(scaled(emb, ["vec_id"], K, STRIDE)),
    }

    def incremental_dedup(d):
        """Round-4 probe: delta-batch near-dedup (probe-local mirror of
        plans/analytics_wave20.q_dedup_incremental). The history band
        index is the PERSISTED artifact (built outside the timer, as the
        registered plan's session cache does); the timed phase is what a
        production ingest pays per delta: hash the newest 20%, probe the
        band index, verify candidates by shingle Jaccard. NOTE the
        scaled() corpus duplicates CONTENT 10×, so every band bucket is
        10× hotter — this measures the duplicate-saturated worst case
        (same caveat as paragraph_dedup), not typical growth."""
        from weather_flink_spark.plans.llm_pipeline import (
            _minhash_bands,
            _shingle_table,
        )

        sh = _shingle_table(d)
        bands = _minhash_bands(sh).persist()
        bands.count()
        h = d.agg(F.expr("max(doc_id) * 4 div 5").alias("h"))

        def ingest():
            new_bands = bands.join(F.broadcast(h)).filter(
                F.col("doc_id") >= F.col("h")
            )
            cand = (
                new_bands.alias("n")
                .join(
                    bands.alias("o"),
                    (F.col("o.band_id") == F.col("n.band_id"))
                    & (F.col("o.band_key") == F.col("n.band_key"))
                    & (F.col("o.doc_id") != F.col("n.doc_id")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("other_id"),
                )
                .distinct()
            )
            inter = F.size(
                F.array_intersect(F.col("x.shingle_h28"), F.col("y.shingle_h28"))
            )
            union = (
                F.size(F.col("x.shingle_h28"))
                + F.size(F.col("y.shingle_h28"))
                - inter
            )
            return (
                cand.join(sh.alias("x"), F.col("x.doc_id") == F.col("new_id"))
                .join(sh.alias("y"), F.col("y.doc_id") == F.col("other_id"))
                .select((inter.cast("double") / union).alias("jaccard"))
                .filter("jaccard >= 0.5")
                .count()
            )

        t = timed(ingest)
        bands.unpersist()
        sh.unpersist()
        return t

    results["incremental_dedup_ingest"] = want("incremental_dedup_ingest") and {
        "x1": incremental_dedup(docs),
        "xN": incremental_dedup(scaled(docs, ["doc_id"], K, STRIDE)),
    }

    def opq_rotate_scan(e):
        """Round-6 probe: the OPQ Householder rotation pass
        (probe-local mirror of operators/opq.rotate_embeddings +
        rotated code assignment). The model fit is driver-side on the
        collected exact Gramian (outside the timer, bounded); the
        timed phase is what the corpus pays: the 4x(dot+axpy) Arrow
        rotation map plus the corpus x 16 broadcast code argmin —
        both corpus-linear by construction."""
        from pyspark.sql import Window as W

        from weather_flink_spark.operators import opq as opq_mod
        from weather_flink_spark.operators import pca as pca_mod

        e_q = pca_mod.quantize_embeddings(e, "embedding", dim=64)
        model = pca_mod.fit_pca_power(e_q, "embedding", dim=64, k=4, iters=60)
        us = opq_mod.fit_opq_householder(model)

        def run():
            rot = opq_mod.rotate_embeddings(e_q, "embedding", us)
            rq = rot.select(
                "vec_id",
                F.transform(
                    F.col("rot"), lambda x: F.round(x, 6).cast("decimal(12,6)")
                ).alias("rq"),
            )
            code = rq.filter(F.col("vec_id") < 16).select(
                F.col("vec_id").alias("code"), F.col("rq").alias("c_rq")
            )
            d2 = " + ".join(
                f"cast(((element_at(rq, {d})) - (element_at(c_rq, {d})))"
                f" * ((element_at(rq, {d})) - (element_at(c_rq, {d}))) as decimal(20,12))"
                for d in range(1, 17)
            )
            w = W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("code").asc())
            return (
                rq.join(F.broadcast(code))
                .select("vec_id", "code", F.expr(d2).alias("d2"))
                .withColumn("rn", F.row_number().over(w))
                .where("rn = 1")
                .count()
            )

        return timed(run)

    ev = load(spark, args.sf, "events")
    results["opq_rotate_scan"] = want("opq_rotate_scan") and {
        "x1": opq_rotate_scan(emb),
        "xN": opq_rotate_scan(scaled(emb, ["vec_id"], K, STRIDE)),
    }

    def funnel_attribution(e):
        """Round-6 probe: sessionized funnel attribution — every window
        shares one user_id sort, then one session-keyed groupBy. Users
        are scaled with shifted keys, so per-user session/window state
        stays constant while the corpus grows."""

        def run():
            from pyspark.sql import Window as W

            kindr = (
                F.when(F.col("event_type") == "view", 0)
                .when(F.col("event_type") == "click", 1)
                .otherwise(2)
            )
            w_user = W.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("kindr").asc(), F.col("event_id").asc()
            )
            w_run = w_user.rowsBetween(W.unboundedPreceding, W.currentRow)
            staged = e.filter(
                F.col("event_type").isin("view", "click", "purchase")
            ).select(
                "user_id", "event_id", "ts", "event_type",
                kindr.alias("kindr"), F.unix_micros("ts").alias("t_us"),
            )
            sess = staged.withColumn("prev_us", F.lag("t_us").over(w_user)).withColumn(
                "session_id",
                F.sum(
                    F.when(
                        F.col("prev_us").isNull()
                        | (F.col("t_us") - F.col("prev_us") > 1_800_000_000),
                        1,
                    ).otherwise(0)
                ).over(w_run),
            )
            w_sess = (
                W.partitionBy("user_id", "session_id")
                .orderBy(F.col("ts").asc(), F.col("kindr").asc(), F.col("event_id").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            q = sess.withColumn(
                "view_run",
                F.max(F.when(F.col("event_type") == "view", F.col("t_us"))).over(w_sess),
            )
            return (
                q.groupBy("user_id", "session_id")
                .agg(F.count("*").alias("n"), F.max("view_run").alias("v"))
                .count()
            )

        return timed(run)

    results["funnel_attribution_sessions"] = want("funnel_attribution_sessions") and {
        "x1": funnel_attribution(ev),
        "xN": funnel_attribution(scaled(ev, ["user_id", "event_id"], K, STRIDE)),
    }

    def hnsw_coarse_build(e):
        """Round-6 probe: the HNSW coarse-layer kNN build (wave 26) —
        the corpus-dependent phase of the hierarchical ANN (search is
        query-bounded). ~25% md5 subsample, multi-probe top-2-cell
        blocking, per-block pairwise cosine, top-3 per src. CAVEAT
        (same as the other in-cell index probes): copies keep the
        trained cell count fixed at k=8, so per-cell density grows
        K-fold and the blocked pair count grows ~K² — in production
        the cell count scales with the corpus (cells ~ n/cell_target),
        keeping per-cell pair work constant; the honest read of the
        measured factor is 'quadratic in per-cell density, linear at
        fixed density', not 'quadratic in corpus size'."""
        from pyspark.sql import Window as W

        def run():
            sub = e.filter(
                F.expr(
                    "cast(conv(substring(md5(concat('hnsw:', cast(vec_id as string))), 1, 7),"
                    " 16, 10) as bigint) % 4 = 0"
                )
            ).select(
                "vec_id",
                F.col("embedding"),
                (F.crc32(F.col("vec_id").cast("string")) % 8).alias("c1"),
                ((F.crc32(F.col("vec_id").cast("string")) + 3) % 8).alias("c2"),
            )
            probe = sub.select(
                "vec_id", "embedding", F.explode(F.array("c1", "c2")).alias("bcell")
            )
            a, n = probe.alias("a"), probe.alias("n")
            dot = F.aggregate(
                F.zip_with(
                    F.col("a.embedding"),
                    F.col("n.embedding"),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            w = W.partitionBy("src").orderBy(F.col("d").desc(), F.col("dst").asc())
            return (
                a.join(
                    n,
                    (F.col("n.bcell") == F.col("a.bcell"))
                    & (F.col("n.vec_id") != F.col("a.vec_id")),
                )
                .select(
                    F.col("a.vec_id").alias("src"),
                    F.col("n.vec_id").alias("dst"),
                    dot.alias("d"),
                )
                .distinct()
                .withColumn("rk", F.row_number().over(w))
                .where("rk <= 3")
                .count()
            )

        return timed(run)

    results["hnsw_coarse_build"] = want("hnsw_coarse_build") and {
        "x1": hnsw_coarse_build(emb),
        "xN": hnsw_coarse_build(scaled(emb, ["vec_id"], K, STRIDE)),
    }

    # --- wave-31 shape: DAU/WAU bounded range join ----------------------
    # scale by user_id (more users, same day span): the activity-matrix
    # dedup grows ~K×, the <=7-bucket range-join fan-out is a constant —
    # expect ~linear.
    events = load(spark, args.sf, "events")

    def dau_wau(ev):
        def run():
            act = ev.select(
                F.col("ts").cast("date").alias("d"), "user_id"
            ).distinct()
            days = act.select("d").distinct()
            a = act.select(F.col("d").alias("ad"), "user_id")
            return (
                days.join(
                    a,
                    F.col("ad").between(
                        F.date_sub(F.col("d"), 6), F.col("d")
                    ),
                )
                .groupBy("d")
                .agg(F.countDistinct("user_id"))
                .count()
            )

        return timed(run)

    results["dau_wau_range_join"] = want("dau_wau_range_join") and {
        "x1": dau_wau(events),
        "xN": dau_wau(scaled(events, ["user_id"], K, STRIDE)),
    }

    # --- wave-29 shape: one k-center greedy round ------------------------
    # scale by vec_id: the round is one struct-MAX aggregate + one
    # broadcast-1-row distance map over the corpus — expect ~linear.
    def kcenter_round(e):
        def run():
            pts = e.select(
                "vec_id",
                F.expr(
                    "transform(embedding, x -> cast(cast(round(cast(x as"
                    " double), 6) as decimal(12,6)) * 1000000 as bigint))"
                ).alias("n"),
            )
            seed = pts.orderBy(F.col("vec_id").asc()).limit(1)
            d2 = F.aggregate(
                F.zip_with(
                    F.col("n"), F.col("cn"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            md = pts.crossJoin(
                F.broadcast(seed.select(F.col("n").alias("cn")))
            ).select("vec_id", d2.alias("md"))
            return (
                md.agg(
                    F.max(
                        F.struct(F.col("md"), (-F.col("vec_id")).alias("nv"))
                    )
                ).collect()
                and 1
            )

        return timed(run)

    results["kcenter_greedy_round"] = want("kcenter_greedy_round") and {
        "x1": kcenter_round(emb),
        "xN": kcenter_round(scaled(emb, ["vec_id"], K, STRIDE)),
    }

    # ------------------------------------------------------------------
    # round-7 shapes (waves 42-47)
    # ------------------------------------------------------------------

    # wave-43: packed sign-bit codes + exhaustive Hamming scan (the
    # binary-quantization tier's whole point: 16 bytes/vector moved)
    def bq_scan(e):
        from pyspark.sql import Window

        lo = (
            "aggregate(transform(slice(embedding, 1, 32),"
            " (x, i) -> IF(cast(x as double) > 0d, shiftleft(1L, i), 0L)),"
            " 0L, (a, b) -> a + b)"
        )
        hi = lo.replace("slice(embedding, 1, 32)", "slice(embedding, 33, 32)")
        codes = e.select(
            "vec_id", F.expr(lo).alias("b_lo"), F.expr(hi).alias("b_hi")
        )
        q = codes.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("b_lo").alias("q_lo"),
            F.col("b_hi").alias("q_hi"),
        )
        ham = codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            "vec_id",
            (
                F.bit_count(F.col("q_lo").bitwiseXOR(F.col("b_lo")))
                + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("b_hi")))
            ).alias("hamming"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("hamming").asc(), F.col("vec_id").asc()
        )
        return (
            ham.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 20)
            .count()
        )

    results["binary_hamming_scan"] = want("binary_hamming_scan") and {
        "x1": timed(lambda: bq_scan(emb)),
        "xN": timed(lambda: bq_scan(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    # wave-46: per-key sequential fold plumbing (collect_list -> one
    # row per user -> mapInPandas over 32 partitions)
    def burst_fold(e):
        import math as _math

        import pandas as pd

        ser = (
            e.select(
                "user_id",
                F.struct(
                    F.unix_micros("ts").alias("t_us"), F.col("event_id")
                ).alias("te"),
            )
            .groupBy("user_id")
            .agg(F.sort_array(F.collect_list("te")).alias("seq"))
            .select("user_id", F.col("seq.t_us").alias("ts_us"))
        )

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for _, row in pdf.iterrows():
                ts = row.ts_us
                n = len(ts)
                if n < 3 or ts[-1] <= ts[0]:
                    continue
                lam0 = (float(n - 1) * 1e6) / float(int(ts[-1]) - int(ts[0]))
                tp = round(_math.log(float(n)), 9)
                d = 1.0e18
                nb = 0
                for i in range(1, n):
                    g = float(int(ts[i]) - int(ts[i - 1])) / 1e6
                    d = (min(tp, d) - min(0.0, d)) + (lam0 * g - 0.6931471805599453)
                    nb += d < 0
                out.append((int(row.user_id), nb))
            return pd.DataFrame(out, columns=["user_id", "nb"])

        return (
            ser.repartition(32, "user_id")
            .mapInPandas(lambda it: (kern(p) for p in it), schema="user_id long, nb long")
            .count()
        )

    ev = load(spark, args.sf, "events")
    results["burst_perkey_fold"] = want("burst_perkey_fold") and {
        "x1": timed(lambda: burst_fold(ev)),
        "xN": timed(lambda: burst_fold(scaled(ev, ["user_id", "event_id"], K, STRIDE))),
    }

    # wave-45: the data-sized phase of Markov attribution (journey
    # window + transition-count groupBy; the hop recursion is bounded
    # model math on top)
    def markov_trans(e):
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        prev = F.lag("event_type").over(w)
        seq = e.select(
            "event_type",
            F.when(prev.isNull() | (prev == "purchase"), F.lit("__START__"))
            .otherwise(prev)
            .alias("src"),
        )
        return seq.groupBy("src", "event_type").count().count()

    results["markov_transition_build"] = want("markov_transition_build") and {
        "x1": timed(lambda: markov_trans(ev)),
        "xN": timed(lambda: markov_trans(scaled(ev, ["user_id", "event_id"], K, STRIDE))),
    }

    # wave-47: within-basket triple generation (cubic in basket size,
    # linear in baskets)
    def triples(l):
        op = l.select("l_orderkey", "l_partkey").dropDuplicates()
        sz = op.groupBy("l_orderkey").count().filter(F.col("count") >= 3).select("l_orderkey")
        qual = op.join(sz, "l_orderkey")
        a, b, c = qual.alias("a"), qual.alias("b"), qual.alias("c")
        t = (
            a.join(b, (F.col("b.l_orderkey") == F.col("a.l_orderkey")) & (F.col("b.l_partkey") > F.col("a.l_partkey")))
            .join(c, (F.col("c.l_orderkey") == F.col("a.l_orderkey")) & (F.col("c.l_partkey") > F.col("b.l_partkey")))
            .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"), F.col("c.l_partkey").alias("p3"))
        )
        return t.groupBy("p1", "p2", "p3").count().filter(F.col("count") >= 2).count()

    results["apriori_triples"] = want("apriori_triples") and {
        "x1": timed(lambda: triples(li)),
        "xN": timed(lambda: triples(scaled(li, ["l_orderkey"], K, STRIDE))),
    }

    # wave-47: boilerplate gram explode + (source,gram) groupBy + join
    def boiler(d):
        toks = d.select("doc_id", "source", F.split(F.lower("text"), " ").alias("tok"))
        grams = toks.filter(F.size("tok") >= 3).select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tok") - F.lit(3)),
                    lambda i: F.array_join(F.slice(F.col("tok"), i + 1, 3), " "),
                )
            ).alias("gram"),
        )
        bp = (
            grams.select("source", "gram", "doc_id").distinct()
            .groupBy("source", "gram").count()
            .filter(F.col("count") >= 3).select("source", "gram")
        )
        return (
            grams.join(bp.withColumnRenamed("gram", "bg").withColumnRenamed("source", "bs"),
                       (F.col("source") == F.col("bs")) & (F.col("gram") == F.col("bg")), "left")
            .groupBy("doc_id").agg(F.count("*"), F.count("bg")).count()
        )

    results["boilerplate_grams"] = want("boilerplate_grams") and {
        "x1": timed(lambda: boiler(docs)),
        "xN": timed(lambda: boiler(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    # wave-42: the compaction/OPTIMIZE job itself (histogram + ONE
    # shuffle + sorted partitioned write); writes to tmp, cleaned after
    def compact(l, tag):
        import shutil
        import tempfile
        import os

        from weather_flink_spark.operators.layout import optimize_zorder

        src = l.select(
            "l_orderkey",
            (F.col("l_partkey") % 16).alias("px"),
            (F.col("l_suppkey") % 16).alias("sx"),
        )
        out = os.path.join(tempfile.gettempdir(), f"wfs_probe_compact_{tag}")
        n = optimize_zorder(spark, src, out, "px", "sx", 12).count()
        shutil.rmtree(out, ignore_errors=True)
        return n

    results["compaction_binpack_write"] = want("compaction_binpack_write") and {
        "x1": timed(lambda: compact(li, "x1")),
        "xN": timed(lambda: compact(scaled(li, ["l_orderkey"], K, STRIDE), "xN")),
    }

    # wave-49: thermometer code build (explode -> broadcast threshold
    # join -> 4-word shift-sum groupBy; thresholds stay the bounded
    # 256-row model of the UNSCALED corpus — at 100 TB the model is
    # trained once on a sample, not per ingest)
    def thermo_build(e):
        from pyspark.sql import functions as FF

        vals = e.select(
            "vec_id", FF.posexplode("embedding").alias("dim", "v")
        ).select("vec_id", "dim", FF.col("v").cast("double").alias("v"))
        thr = emb.select(
            "vec_id", FF.posexplode("embedding").alias("dim", "v")
        ).select("dim", FF.col("v").cast("double").alias("v")).groupBy(
            "dim"
        ).agg(
            FF.expr("percentile_approx(v, array(0.2,0.4,0.6,0.8), 100)").alias("qs")
        ).select("dim", FF.posexplode("qs").alias("k0", "thr")).select(
            "dim", (FF.col("k0") + 1).alias("k"), "thr"
        )
        word_aggs = [
            FF.expr(
                f"CAST(sum(CASE WHEN dim div 16 = {w} AND v > thr"
                f" THEN shiftleft(1L, 4 * (dim % 16) + k - 1)"
                f" ELSE 0L END) AS BIGINT)"
            ).alias(f"w{w}")
            for w in range(4)
        ]
        return vals.join(FF.broadcast(thr), "dim").groupBy("vec_id").agg(*word_aggs).count()

    results["thermo256_code_build"] = want("thermo256_code_build") and {
        "x1": timed(lambda: thermo_build(emb)),
        "xN": timed(lambda: thermo_build(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    # wave-52: image aHash + LSH band join + verdict rollup (the
    # candidate space scales with collisions, the scan with images)
    def ahash_dedup(d):
        from weather_flink_spark.operators.multimodal import (
            ahash_frame,
            encode_bmp_payload,
        )
        from pyspark.sql import Window as W

        ah = ahash_frame(encode_bmp_payload(d.select("doc_id", "text")))
        bands = spark.range(4).select(F.col("id").cast("int").alias("b"))
        banded = ah.crossJoin(F.broadcast(bands)).select(
            "doc_id", "width", "height", "ahash", "b",
            F.expr("shiftright(ahash, b * 10) & 1023").alias("band_key"),
        )
        x, y = banded.alias("x"), banded.alias("y")
        ham = F.bit_count(F.col("x.ahash").bitwiseXOR(F.col("y.ahash"))).cast("int")
        cand = (
            x.join(y, (F.col("y.width") == F.col("x.width"))
                   & (F.col("y.height") == F.col("x.height"))
                   & (F.col("y.b") == F.col("x.b"))
                   & (F.col("y.band_key") == F.col("x.band_key"))
                   & (F.col("y.doc_id") > F.col("x.doc_id")))
            .select(F.col("x.doc_id").alias("id1"), F.col("y.doc_id").alias("id2"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= 3).distinct()
        )
        return cand.groupBy("id1").count().count()

    results["ahash_band_dedup"] = want("ahash_band_dedup") and {
        "x1": timed(lambda: ahash_dedup(docs)),
        "xN": timed(lambda: ahash_dedup(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    # wave-53: BFS rounds (frontier-only expansion, integer-encoded
    # nodes — the post-close trimmed plan)
    def bfs(l):
        ed = l.select("l_orderkey", "l_partkey").distinct()
        p_enc = F.col("l_partkey") * 2
        o_enc = F.col("l_orderkey") * 2 + 1
        edges = ed.select(p_enc.alias("src"), o_enc.alias("dst")).unionByName(
            ed.select(o_enc.alias("src"), p_enc.alias("dst"))
        )
        frontier = (
            ed.filter(F.col("l_partkey") <= 3)
            .select(p_enc.alias("node")).distinct()
            .select("node", F.lit(0).alias("lvl"))
            .localCheckpoint()
        )
        reached = frontier
        for k in range(1, 5):
            frontier = (
                frontier.join(edges, frontier.node == edges.src)
                .select(F.col("dst").alias("node")).distinct()
                .join(reached.select("node"), "node", "left_anti")
                .select("node", F.lit(k).alias("lvl"))
                .localCheckpoint()
            )
            reached = reached.unionByName(frontier)
        return reached.count()

    results["bfs_rounds"] = want("bfs_rounds") and {
        "x1": timed(lambda: bfs(li)),
        "xN": timed(lambda: bfs(scaled(li, ["l_orderkey"], K, STRIDE))),
    }

    # wave-53: CDC merge (latest-per-key + full-outer coalesce)
    def cdc_merge(ev):
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        cutoff = ev.agg(F.expr("percentile_approx(cast(ts as double), 0.8)")).collect()[0][0]

        def latest(df):
            return (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "ts", "value")
            )

        base = latest(ev.filter(F.col("ts").cast("double") < cutoff)).alias("b")
        delta = latest(ev.filter(F.col("ts").cast("double") >= cutoff)).alias("d")
        return base.join(delta, F.col("b.user_id") == F.col("d.user_id"), "full_outer").count()

    events_df = load(spark, args.sf, "events")
    results["cdc_merge_fullouter"] = want("cdc_merge_fullouter") and {
        "x1": timed(lambda: cdc_merge(events_df)),
        "xN": timed(lambda: cdc_merge(scaled(events_df, ["user_id", "event_id"], K, STRIDE))),
    }

    # wave-51: 3-D compaction write (same job, 3-way curve)
    def compact3(l, tag):
        import os
        import shutil
        import tempfile

        from weather_flink_spark.operators.layout import optimize_zorder3

        src = l.select(
            "l_orderkey",
            (F.col("l_partkey") % 8).alias("px"),
            (F.col("l_suppkey") % 8).alias("sx"),
            (F.col("l_orderkey") % 8).alias("ox"),
        )
        out = os.path.join(tempfile.gettempdir(), f"wfs_probe_compact3_{tag}")
        n = optimize_zorder3(spark, src, out, ["px", "sx", "ox"], 12).count()
        shutil.rmtree(out, ignore_errors=True)
        return n

    results["zorder3_binpack_write"] = want("zorder3_binpack_write") and {
        "x1": timed(lambda: compact3(li, "x1")),
        "xN": timed(lambda: compact3(scaled(li, ["l_orderkey"], K, STRIDE), "xN")),
    }

    # --- round-9 shapes -------------------------------------------------

    # wave-26 r9: cross-cell base-edge build — broadcast-k distance
    # pass (2nd-nearest cell per vector) + ONE cell-keyed blocked join
    # + per-src top-1 window (the l0_xcell_edges_table shape)
    def xcell_edges(e):
        from pyspark.sql import Window as W

        from weather_flink_spark.plans.llm_pipeline import dot_col

        a0 = e.select(
            "vec_id",
            "embedding",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        "embedding", lambda x: x.cast("double") * x.cast("double")
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("nrm"),
            (F.col("vec_id") % 8).alias("cell"),
        )
        cent = (
            a0.select("cell", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("s"))
            .select(F.col("cell").alias("cid"), F.col("s.m").alias("c"))
        )
        d2 = F.aggregate(
            F.zip_with(
                "embedding", "c", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w_probe = W.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
        probe2 = (
            a0.crossJoin(F.broadcast(cent))
            .select("vec_id", "embedding", "nrm", "cid", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w_probe))
            .filter(F.col("rn") == 2)
            .select("vec_id", "embedding", "nrm", F.col("cid").alias("bcell"))
        )
        a, n = probe2.alias("a"), a0.alias("n")
        cos_an = dot_col(F.col("a.embedding"), F.col("n.embedding")) / (
            F.col("a.nrm") * F.col("n.nrm")
        )
        w = W.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst").asc())
        return (
            a.join(
                n,
                (F.col("n.cell") == F.col("a.bcell"))
                & (F.col("n.vec_id") != F.col("a.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("src"),
                F.col("n.vec_id").alias("dst"),
                cos_an.alias("cosine"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 1)
            .count()
        )

    results["xcell_edge_build"] = want("xcell_edge_build") and {
        "x1": timed(lambda: xcell_edges(emb)),
        "xN": timed(lambda: xcell_edges(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    # wave-46 collapse applied r9 (lttb/holt/kalman crossing shape):
    # collect_list-per-key + mapInPandas over 32 hash partitions
    def collapse_fold(ev):
        import pandas as pd

        ser = (
            ev.select(
                "user_id",
                F.struct(
                    F.unix_micros("ts").alias("t_us"),
                    F.col("event_id").alias("eid"),
                    F.col("value").alias("v"),
                ).alias("p"),
            )
            .groupBy("user_id")
            .agg(F.sort_array(F.collect_list("p")).alias("seq"))
            .select("user_id", F.col("seq.v").alias("vals"))
        )

        def kern(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for _, row in pdf.iterrows():
                y = row["vals"]
                s = 0.0
                for x in y:
                    s = 0.5 * float(x) + 0.5 * s
                out.append((int(row["user_id"]), len(y), s))
            return pd.DataFrame(out, columns=["user_id", "n", "s"])

        return (
            ser.repartition(32, "user_id")
            .mapInPandas(
                lambda it: (kern(pdf) for pdf in it),
                schema="user_id long, n long, s double",
            )
            .count()
        )

    ev9 = load(spark, args.sf, "events")
    results["series_collapse_fold"] = want("series_collapse_fold") and {
        "x1": timed(lambda: collapse_fold(ev9)),
        "xN": timed(
            lambda: collapse_fold(scaled(ev9, ["user_id", "event_id"], K, STRIDE))
        ),
    }

    # wave-56: the 100-query Hamming panel scan (per tier: broadcast
    # 100 queries x corpus codes -> per-query window -> exact rerank)
    def panel_scan(e):
        from pyspark.sql import Window as W

        from weather_flink_spark.plans.llm_pipeline import dot_col

        codes = e.select(
            "vec_id",
            "embedding",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        "embedding", lambda x: x.cast("double") * x.cast("double")
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("nrm"),
            F.expr(
                "CAST(aggregate(zip_with(embedding, sequence(0, 62),"
                " (e, i) -> CASE WHEN CAST(e AS DOUBLE) > 0"
                " THEN shiftleft(1L, i) ELSE 0L END),"
                " 0L, (acc, x) -> acc | x) AS BIGINT)"
            ).alias("code"),
        )
        q = codes.filter(F.col("vec_id") % 1000 < 5).limit(100).select(
            F.col("vec_id").alias("query_id"),
            F.col("code").alias("q_code"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
        ham = F.bit_count(F.col("q_code").bitwiseXOR(F.col("code")))
        w_h = W.partitionBy("query_id").orderBy(F.col("h").asc(), F.col("vec_id").asc())
        cand = (
            codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", ham.alias("h"), "embedding", "nrm", "q_emb", "q_nrm")
            .withColumn("rk", F.row_number().over(w_h))
            .filter(F.col("rk") <= 30)
        )
        cos = dot_col(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
        w_c = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        return (
            cand.select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("k", F.row_number().over(w_c))
            .filter(F.col("k") <= 5)
            .count()
        )

    results["panel_hamming_scan"] = want("panel_hamming_scan") and {
        "x1": timed(lambda: panel_scan(emb)),
        "xN": timed(lambda: panel_scan(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    # wave-57: audio energy-hash band dedup (same LSH family as ahash,
    # audio block key)
    def ehash_dedup(d):
        from weather_flink_spark.operators.multimodal import (
            encode_wav_payload,
            energyhash_frame,
        )

        eh = energyhash_frame(encode_wav_payload(d.select("doc_id", "text")))
        bands = spark.range(4).select(F.col("id").cast("int").alias("b"))
        banded = eh.crossJoin(F.broadcast(bands)).select(
            "doc_id", "sample_rate", "ehash", "b",
            F.expr("shiftright(ehash, b * 8) & 255").alias("band_key"),
        )
        x, y = banded.alias("x"), banded.alias("y")
        hamv = F.bit_count(F.col("x.ehash").bitwiseXOR(F.col("y.ehash"))).cast("int")
        cand = (
            x.join(
                y,
                (F.col("y.sample_rate") == F.col("x.sample_rate"))
                & (F.col("y.b") == F.col("x.b"))
                & (F.col("y.band_key") == F.col("x.band_key"))
                & (F.col("y.doc_id") > F.col("x.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("id1"),
                F.col("y.doc_id").alias("id2"),
                hamv.alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
            .distinct()
        )
        return cand.groupBy("id1").count().count()

    results["ehash_band_dedup"] = want("ehash_band_dedup") and {
        "x1": timed(lambda: ehash_dedup(docs)),
        "xN": timed(lambda: ehash_dedup(scaled(docs, ["doc_id"], K, STRIDE))),
    }

    results = {k: v for k, v in results.items() if v}
    for name, r in results.items():
        r["factor"] = round(r["xN"] / r["x1"], 1) if r["x1"] else None
    print(json.dumps({"copies": K, "sf": args.sf, "results": results}, indent=2))


if __name__ == "__main__":
    main()
