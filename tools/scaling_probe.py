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
    args = ap.parse_args()
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

    results["scan_filter_agg"] = {
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

    results["fact_join_agg"] = {
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

    results["minhash_signatures"] = {
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

    results["cosine_topk_bruteforce"] = {
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
    results["cdc_merge_upsert"] = {
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
    results["triangle_count"] = {
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

    results["kmeans_one_iteration"] = {
        "x1": timed(lambda: kmeans_iter(emb)),
        "xN": timed(lambda: kmeans_iter(scaled(emb, ["vec_id"], K, STRIDE))),
    }

    for name, r in results.items():
        r["factor"] = round(r["xN"] / r["x1"], 1) if r["x1"] else None
    print(json.dumps({"copies": K, "sf": args.sf, "results": results}, indent=2))


if __name__ == "__main__":
    main()
