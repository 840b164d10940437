"""Salted join: identical results to the plain join on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_flink_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of fact rows share key 0 — the pathological hot key
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "fact_id", "label")
    salted = salted_join(fact, dim, "k", n_salts=8, spread_col="fact_id").select(
        "k", "fact_id", "label"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    fact, dim = _skewed_frames(spark)
    dim_small = dim.filter(F.col("k") < 50)  # some fact keys unmatched
    plain = fact.join(dim_small, "k", "left").select("k", "fact_id", "label")
    salted = salted_join(fact, dim_small, "k", n_salts=4, spread_col="fact_id", how="left").select(
        "k", "fact_id", "label"
    )
    key = lambda rows: sorted((r["k"], r["fact_id"], r["label"]) for r in rows)
    assert key(plain.collect()) == key(salted.collect())


def test_salting_actually_spreads_the_hot_key(spark):
    fact, _ = _skewed_frames(spark)
    from weather_flink_spark.operators.skew import SALT_COL

    salted = fact.withColumn(
        SALT_COL, F.pmod(F.hash(F.col("fact_id")), F.lit(8))
    )
    hot = salted.filter(F.col("k") == 0).groupBy(SALT_COL).count().collect()
    assert len(hot) == 8  # hot key hits every salt bucket
    counts = [r["count"] for r in hot]
    assert max(counts) < 2 * min(counts)  # roughly even spread
