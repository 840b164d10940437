"""Central registry of engine queries (the SURVEY.md §2-C contract).

Every operator the engine claims is registered here as a ``QuerySpec``:
a named Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` exposes this registry to the driver.

Numeric-parity discipline (SURVEY.md §7 M1 "oracle parity traps"):
aggregates over double columns go through exact DECIMAL arithmetic on
both sides and surface as DOUBLE, so Spark's partition-order-dependent
float summation can never drift from DuckDB's sequential summation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query under ``name`` with its oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration) and return the registry."""
    # Local imports so that merely importing the package stays cheap.
    from weather_flink_spark.plans import (  # noqa: F401
        relational,
        relational_extra,
        joins,
        aggregates,
        windows,
        setops,
        llm_pipeline,
        llm_extra,
        similarity_extra,
        corpus_extra,
        pipeline_extra,
        sources_extra,
        events_queries,
        timeseries_stats,
        analytics_extra,
        analytics_wave3,
        analytics_wave4,
        tpch_suite,
        llm_wave5,
        analytics_wave6,
        analytics_wave7,
        analytics_wave8,
        analytics_wave9,
        analytics_wave10,
        analytics_wave11,
        analytics_wave12,
        analytics_wave13,
        analytics_wave14,
        analytics_wave15,
        analytics_wave16,
        analytics_wave17,
        analytics_wave18,
        analytics_wave19,
        analytics_wave20,
        analytics_wave21,
        analytics_wave22,
        analytics_wave23,
        analytics_wave24,
        analytics_wave25,
        analytics_wave26,
        analytics_wave27,
        analytics_wave28,
        analytics_wave29,
        analytics_wave30,
        analytics_wave31,
        analytics_wave32,
        analytics_wave33,
        analytics_wave34,
        analytics_wave35,
        analytics_wave36,
        analytics_wave37,
        analytics_wave38,
        analytics_wave39,
        analytics_wave40,
        analytics_wave41,
        analytics_wave42,
        analytics_wave43,
        analytics_wave44,
        analytics_wave45,
        analytics_wave46,
        analytics_wave47,
        analytics_wave48,
        analytics_wave49,
        analytics_wave50,
        analytics_wave51,
        analytics_wave52,
        analytics_wave53,
        analytics_wave54,
        analytics_wave55,
        analytics_wave56,
        analytics_wave57,
        analytics_wave58,
        analytics_wave59,
        analytics_wave60,
        analytics_wave61,
        analytics_wave62,
        analytics_wave63,
        analytics_wave64,
        analytics_wave65,
        analytics_wave66,
        analytics_wave67,
        analytics_wave68,
        analytics_wave69,
        analytics_wave70,
        analytics_wave71,
        analytics_wave72,
        analytics_wave73,
        analytics_wave74,
        analytics_wave75,
        analytics_wave76,
        analytics_wave77,
        analytics_wave78,
        streaming_queries,
    )

    return dict(_REGISTRY)
