"""Scans, filters, projection and scalar-function queries.

SURVEY.md §2-C blocks "Scans/sources" and "Projection / filter / scalar
functions". Everything here is pure Catalyst expressions — predicate
pushdown, column pruning and partition pruning reach the parquet scan
(verified via .explain in tests/test_plans_scale.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import register


@register(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    doc="Parquet scan with column projection; ReadSchema prunes to 3 columns.",
    tags=("scan",),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")


@register(
    "q_scan_filter_pushdown",
    oracle="""
        SELECT l_orderkey, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45.0 AND l_returnflag = 'R'
    """,
    doc="Scan with predicates pushed into the parquet reader (PushedFilters).",
    tags=("scan",),
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45.0) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_compound",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_totalprice BETWEEN 1000.0 AND 5000.0
               AND o_orderstatus IN ('O', 'F'))
           OR o_orderpriority = '1-URGENT'
    """,
    doc="Compound predicates: BETWEEN, IN, OR, AND.",
    tags=("filter",),
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice").between(1000.0, 5000.0) & F.col("o_orderstatus").isin("O", "F"))
        | (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "q_string_funcs",
    oracle="""
        SELECT
            p_partkey,
            UPPER(p_name) AS name_upper,
            LOWER(p_brand) AS brand_lower,
            SUBSTRING(p_type, 1, 5) AS type_prefix,
            CONCAT_WS('|', p_brand, p_type) AS brand_type,
            LENGTH(p_name) AS name_len,
            TRIM(p_name) AS name_trim,
            REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS type_word,
            (p_name LIKE '%a%') AS has_a,
            REPLACE(p_brand, '#', '-') AS brand_dash
        FROM part
    """,
    doc="String function library: upper/lower/substr/concat/trim/length/like/regexp/replace.",
    tags=("scalar",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
    )


@register(
    "q_date_funcs",
    oracle="""
        SELECT
            o_orderkey,
            CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
            CAST(YEAR(o_orderdate) AS INT) AS order_year,
            CAST(MONTH(o_orderdate) AS INT) AS order_mon,
            CAST(DAYOFMONTH(o_orderdate) AS INT) AS order_day,
            CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
            DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025,
            CAST(QUARTER(o_orderdate) AS INT) AS order_q
        FROM orders
    """,
    doc="Date/time functions: trunc, extract, add, diff, quarter.",
    tags=("scalar",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_mon"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAY"))
        .cast("timestamp")
        .alias("due_ts"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2025"
        ),
        F.quarter("o_orderdate").alias("order_q"),
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(l_extendedprice, 1) AS price_round,
            ABS(l_discount - 0.05) AS disc_dev,
            CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
            CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
            ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
            ROUND(POW(1.0 + l_tax, 2), 6) AS tax_sq,
            MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod,
            SQRT(l_extendedprice) AS price_sqrt,
            CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign
        FROM lineitem
    """,
    doc="Math function library: round/abs/ceil/floor/ln/pow/mod/sqrt/sign.",
    tags=("scalar",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "q_case_when",
    oracle="""
        SELECT
            o_orderkey,
            CASE
                WHEN o_totalprice > 4000.0 THEN 'high'
                WHEN o_totalprice > 1500.0 THEN 'mid'
                ELSE 'low'
            END AS price_band,
            CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open
        FROM orders
    """,
    doc="Conditional projection: CASE WHEN chains.",
    tags=("scalar",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 4000.0, "high")
        .when(F.col("o_totalprice") > 1500.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
    )


@register(
    "q_cast_types",
    oracle="""
        SELECT
            l_orderkey,
            CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
            CAST(l_quantity AS INT) AS qty_int,
            CAST(l_orderkey AS VARCHAR) AS key_str,
            CAST(l_shipdate AS DATE) AS ship_date,
            CAST(l_linenumber AS DOUBLE) AS line_dbl,
            CAST(l_returnflag = 'R' AS INT) AS is_return
        FROM lineitem
    """,
    doc="Cast matrix: double→decimal/int, int→string/double, ts→date, bool→int.",
    tags=("scalar",),
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )


@register(
    "q_array_funcs",
    oracle="""
        SELECT
            vec_id,
            LEN(embedding) AS dim,
            CAST(embedding[1] AS DOUBLE) AS first_elem,
            CAST(embedding[64] AS DOUBLE) AS last_elem,
            LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS elem_sum,
            LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS elem_max,
            LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_pos
        FROM embeddings
    """,
    doc="Array ops over embeddings.embedding: size, index, fold-sum, max, filter-count.",
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("elem_sum"),
        F.array_max(dbl).alias("elem_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )
