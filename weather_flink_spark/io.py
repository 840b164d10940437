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
    not have gone through session.get_spark). Applied once per session
    object — each conf.set is a py4j roundtrip, and load() runs on
    every table reference (r11)."""
    if getattr(spark, "_wfs_confs_ok", False):
        return
    try:
        # date/time semantics must match DuckDB's UTC interpretation
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark._wfs_confs_ok = True
    except Exception:
        pass


# Resolved-plan cache: (applicationId, sf_dir, table) -> DataFrame.
# ``spark.read.parquet`` re-resolves the file index and footer schema on
# the DRIVER on every call — measured 85 ms/call on this host — and the
# suite composes ~900 table references per bench pass, i.e. tens of
# seconds of pure metadata stalls. The cached object is the LOGICAL
# PLAN only (DataFrames are immutable); every execution still scans the
# parquet input — no rows or results are memoized. This is the same
# metadata-reuse lever as Spark's own file-index cache (guide §6),
# applied at the catalog boundary. Keyed by applicationId so a new
# session never sees another session's plans.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Projection/filters push into the scan.

    ``events.ts`` has shipped in two physical forms across testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects — read as nanos long via ``nanosAsLong`` and truncate
    to microseconds, DuckDB's truncation) and plain TIMESTAMP(MICROS)
    without timezone (reads as TIMESTAMP_NTZ — cast to TimestampType
    under the pinned UTC session zone, the same instants DuckDB sees).
    Both normalize to microsecond TimestampType named ``ts``.

    Cache invariants (r11 advice, documented): repeated ``load`` of the
    same (session, sf_dir, table) returns the IDENTICAL DataFrame
    object — a plan that self-joins two load() results must
    ``.alias()`` each side (standard Spark self-join hygiene; every
    registry entry that self-joins already derives distinct frames).
    The cached plan also pins the resolved file index: files
    added/removed under ``sf_dir`` mid-process are not seen, which is
    the contract here (the driver's testdata is immutable per run —
    at 100 TB a manifest table format owns this invalidation instead).
    Entries from dead sessions are pruned when a new appid pins.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    appid = getattr(spark, "_wfs_appid", None)
    if appid is None:
        # pinned on the session OBJECT (not keyed by id()), so a new
        # session can never inherit a dead session's cache entries
        appid = spark.sparkContext.applicationId
        spark._wfs_appid = appid
        # a fresh session means prior sessions' plans are dead weight;
        # dropping them bounds _PLAN_CACHE at (tables x sf_dirs) for
        # the live session (r11 advice: unbounded growth across appids)
        for k in [k for k in _PLAN_CACHE if k[0] != appid]:
            del _PLAN_CACHE[k]
    key = (appid, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_uncached(spark, sf_dir, name)
    _PLAN_CACHE[key] = df
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
