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


def test_survey_section2_lists_every_registry_entry():
    """SURVEY.md §2 is the spec of record: every registered query must
    have a §2 inventory row (as a `q_...`/`s_...` backticked table
    key), and every §2 key must still exist in the registry — the
    drift the round-5 verdict flagged can't silently recur."""
    from pathlib import Path

    survey = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    # §2 spans from its heading to the §3 heading
    m = re.search(r"^## 2\..*?(?=^## 3\.)", survey, re.M | re.S)
    assert m, "SURVEY.md §2 heading not found"
    sect2 = m.group(0)
    surveyed = set(re.findall(r"`([qs]_[a-z0-9_]+)`", sect2))
    registered = set(all_specs())

    missing_rows = registered - surveyed
    assert not missing_rows, (
        f"registry entries with no SURVEY §2 row: {sorted(missing_rows)}"
    )
    # §2 prose may mention helper names; only enforce table keys that
    # LOOK like query keys but aren't registered (catches stale rows
    # after a rename/removal).
    ghost_rows = surveyed - registered
    assert not ghost_rows, (
        f"SURVEY §2 names queries absent from the registry: {sorted(ghost_rows)}"
    )


def test_survey_section2_oracle_column_matches_registry():
    """A §2 row's oracle column must agree with all_specs(): rows
    documented `yes` carry an oracle, rows documented rows-only don't."""
    from pathlib import Path

    survey = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    m = re.search(r"^## 2\..*?(?=^## 3\.)", survey, re.M | re.S)
    sect2 = m.group(0)
    specs = all_specs()
    mismatches = []
    for line in sect2.splitlines():
        row = re.match(r"\|\s*`([qs]_[a-z0-9_]+)`\s*\|(.*)\|\s*$", line)
        if not row or row.group(1) not in specs:
            continue
        name = row.group(1)
        oracle_cell = row.group(2).rsplit("|", 1)[-1].strip().lower()
        documented_yes = oracle_cell.startswith("yes")
        has_oracle = specs[name].oracle is not None
        if documented_yes != has_oracle:
            mismatches.append((name, oracle_cell, has_oracle))
    assert not mismatches, f"SURVEY §2 oracle column out of sync: {mismatches}"


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
