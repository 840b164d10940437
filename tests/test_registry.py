"""Registry contract tests: every spec is callable, oracle-covered, aliased."""

from __future__ import annotations

import re

from weather_flink_spark.plans.registry import all_specs


def test_specs_nonempty_and_named():
    specs = all_specs()
    assert len(specs) >= 40
    for name, spec in specs.items():
        assert name == spec.name
        assert name.startswith("q_") or name.startswith("s_")
        assert callable(spec.fn)


def test_oracle_coverage():
    """Every batch query should carry an oracle unless explicitly approximate."""
    specs = all_specs()
    no_oracle = {n for n, s in specs.items() if s.oracle is None and n.startswith("q_")}
    # q_sim_cosine_topk_arrow: BLAS float order differs from the
    # oracle's sequential fold — its equivalence is pinned by
    # tests/test_vector_search.py instead; q_text_compression_ratio:
    # DEFLATE bytes are library-defined — pinned against local zlib in
    # tests/test_analytics_wave23.py.
    # (Holt, Holt-Winters and LTTB left this list in round 4; the four
    # sketch aggregates left in round 5 via the bounds pattern, and
    # q_emb_pca_project left in round 5 via the power-iteration
    # recursive-CTE replay in operators/pca.py.)
    assert no_oracle <= {
        "q_sim_cosine_topk_arrow",
        "q_text_compression_ratio",
    }, f"unexpected oracle-less queries: {no_oracle}"


def test_driver_contract_shape():
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert set(o) <= set(q)
    for sql in o.values():
        assert re.search(r"\bSELECT\b", sql, re.I)


def test_entry_returns_rows(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
