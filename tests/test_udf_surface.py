"""UDF-surface conformance tests — one per injection mechanism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_flink_spark.functions.udf_surface import (
    explode_tokens_udtf,
    geometric_mean,
    haversine_km,
    luhn_checksum_row,
    normalize_per_device,
    zscore_clip,
)


def test_expression_composition_haversine(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    km = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km")
    ).first()["km"]
    assert abs(km - 343.5) < 1.0  # Paris→London


def test_pandas_udf_scalar_zscore(spark):
    df = spark.createDataFrame(
        [(10.0, 5.0, 2.5), (5.0, 5.0, 2.5), (1000.0, 5.0, 2.5)], "x double, m double, s double"
    )
    out = [r["z"] for r in df.select(zscore_clip()("x", "m", "s").alias("z")).collect()]
    assert out[0] == pytest.approx(2.0)
    assert out[1] == pytest.approx(0.0)
    assert out[2] == 4.0  # clipped


def test_pandas_udf_grouped_agg_geomean(spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 8.0), ("b", 3.0)], "k string, v double")
    got = {
        r["k"]: r["gm"]
        for r in df.groupBy("k").agg(geometric_mean()("v").alias("gm")).collect()
    }
    assert got["a"] == pytest.approx(4.0)
    assert got["b"] == pytest.approx(3.0)


def test_apply_in_pandas_normalize(spark):
    df = spark.createDataFrame(
        [("d1", 1, 10.0), ("d1", 2, 30.0), ("d2", 1, 7.0)],
        "deviceId string, timestamp long, temperature double",
    )
    rows = {(r["deviceId"], r["timestamp"]): r["t_norm"] for r in normalize_per_device(df).collect()}
    assert rows[("d1", 1)] == 0.0
    assert rows[("d1", 2)] == 1.0
    assert rows[("d2", 1)] == 0.0  # single-value group → span fallback


def test_udtf_explode_tokens(spark):
    spark.udtf.register("explode_tokens", explode_tokens_udtf())
    rows = spark.sql("SELECT * FROM explode_tokens('a b  c')").collect()
    assert [(r["token"], r["pos"]) for r in rows] == [("a", 0), ("b", 1), ("c", 3)]


def test_row_udf_luhn(spark):
    df = spark.createDataFrame([("7992739871",), ("notdigits",)], "s string")
    out = [r["d"] for r in df.select(luhn_checksum_row()("s").alias("d")).collect()]
    assert out == ["3", None]
