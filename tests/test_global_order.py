"""operators/global_order must be bit-identical to the single-partition
global windows it replaces — verified directly against Spark's own
Window results on a multi-partition input with duplicate sort values."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_flink_spark.operators.global_order import (
    attach_exclusive_prefix_max,
    attach_global_ntile,
    attach_global_row_number,
)


@pytest.fixture(scope="module")
def base_df(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 50), random.random()) for i in range(997)]
    return spark.createDataFrame(rows, "id long, k long, v double").repartition(16)


def test_global_row_number_matches_window(base_df):
    order = [F.col("v").desc(), F.col("id").asc()]
    got = attach_global_row_number(base_df, order, "rn", num_partitions=8)
    exp = base_df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0


@pytest.mark.parametrize("n", [4, 7, 1000])
def test_global_ntile_matches_window(base_df, n):
    # n=1000 > N exercises the q == 0 branch (every bucket 0 or 1 rows)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = attach_global_ntile(base_df, n, order, "nt", num_partitions=8)
    exp = base_df.withColumn("nt", F.ntile(n).over(Window.orderBy(*order)))
    diff = (
        got.select("id", F.col("nt").cast("int").alias("nt"))
        .exceptAll(exp.select("id", "nt"))
        .count()
    )
    assert diff == 0


def test_exclusive_prefix_max_matches_window(base_df):
    # duplicate k values straddle range-partition boundaries; id tie-break
    # keeps the order total as the module contract requires
    order = [F.col("k").asc(), F.col("id").asc()]
    got = attach_exclusive_prefix_max(base_df, order, "v", "pm", num_partitions=8)
    exp = base_df.withColumn(
        "pm",
        F.max("v").over(Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)),
    )
    assert got.select("id", "pm").exceptAll(exp.select("id", "pm")).count() == 0
    # first row of the total order has an empty preceding frame -> NULL
    assert got.filter(F.col("pm").isNull()).count() == 1


def test_global_ntile_empty_input(spark):
    # r11: N is derived from max(global rank) instead of a second
    # aggregate over the input — an empty frame must yield an empty
    # result (not a crash on a NULL N)
    empty = spark.createDataFrame([], "id long, v double")
    got = attach_global_ntile(empty, 4, [F.col("v").asc(), F.col("id").asc()], "nt")
    assert got.count() == 0


def test_chained_ntiles_match_windows(spark):
    # r11: the RFM shape — three chained ntile calls over snapshotted
    # (localCheckpoint) intermediates must stay bit-identical to three
    # independent global windows
    random.seed(11)
    rows = [(i, random.random(), random.randint(0, 9)) for i in range(499)]
    df = spark.createDataFrame(rows, "id long, a double, b long").repartition(8)
    got = attach_global_ntile(df, 4, [F.col("a").asc(), F.col("id").asc()], "n1", num_partitions=4)
    got = attach_global_ntile(got, 4, [F.col("b").desc(), F.col("id").asc()], "n2", num_partitions=4)
    got = attach_global_ntile(got, 4, [F.col("id").asc()], "n3", num_partitions=4)
    exp = (
        df.withColumn("n1", F.ntile(4).over(Window.orderBy(F.col("a").asc(), F.col("id").asc())))
        .withColumn("n2", F.ntile(4).over(Window.orderBy(F.col("b").desc(), F.col("id").asc())))
        .withColumn("n3", F.ntile(4).over(Window.orderBy(F.col("id").asc())))
    )
    cols = ["id", "n1", "n2", "n3"]
    g = got.select(*[F.col(c).cast("int") if c != "id" else F.col(c) for c in cols])
    assert g.exceptAll(exp.select(*cols)).count() == 0
