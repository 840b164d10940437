"""Every registered query must be deterministic and re-runnable.

The driver calls queries() on one long-lived session, possibly more
than once; a temp-view collision, leaked persist, or hidden
nondeterminism (rand(), unordered limit, wall-clock) would corrupt the
correctness gate. Two back-to-back runs must agree exactly on counts.
"""

from __future__ import annotations
import pytest

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_every_query_is_rerunnable_and_count_stable(spark):
    flaky = {}
    errors = {}
    for name, spec in sorted(all_specs().items()):
        try:
            c1 = spec.fn(spark, SF).count()
            c2 = spec.fn(spark, SF).count()
        except Exception as ex:  # pragma: no cover
            errors[name] = str(ex)[:200]
            continue
        if c1 != c2:
            flaky[name] = (c1, c2)
    assert not errors, f"queries raised on rerun: {errors}"
    assert not flaky, f"count-unstable queries: {flaky}"
