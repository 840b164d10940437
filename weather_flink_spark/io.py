"""Table catalog over the driver testdata layout.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale note: at 100 TB these would be partitioned parquet datasets (or
Iceberg/Delta tables); ``load`` keeps the same call signature — Spark's
parquet source handles directory datasets, partition pruning and
predicate pushdown identically. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the oracle contract depends on, enforced on ANY
    session (the driver's verify uses its own SparkSession, which may
    not have gone through session.get_spark)."""
    try:
        # date/time semantics must match DuckDB's UTC interpretation
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Projection/filters push into the scan.

    ``events.ts`` has shipped in two physical forms across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects — read as nanos long via ``nanosAsLong`` and truncate
    to microseconds, DuckDB's truncation) and plain TIMESTAMP(MICROS)
    without timezone (reads as TIMESTAMP_NTZ — cast to TimestampType
    under the pinned UTC session zone, the same instants DuckDB sees).
    Both normalize to microsecond TimestampType named ``ts``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer div: ns→µs must not round-trip through double
            # (2^63 ns epoch values exceed double's 53-bit mantissa)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return spark.read.parquet(table_path(sf_dir, name))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
