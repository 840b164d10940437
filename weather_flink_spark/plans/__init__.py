"""Query-plan registry package."""

from weather_flink_spark.plans.registry import QuerySpec, all_specs, register

__all__ = ["QuerySpec", "all_specs", "register"]
