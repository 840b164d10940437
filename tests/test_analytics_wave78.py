"""Wave-78: multi-column (Z-order) row-group skipping — done-bar:
footer-equality layout proof, oracle-replayed two-column zone
decisions + executed scans, and the measured Z-order trade vs the
single-column counterfactual (secondary-only probes win big, primary
pays its bucket window)."""

from __future__ import annotations

import os

from weather_flink_spark.plans import analytics_wave78 as w78
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _rows(spark):
    return {
        (r.probe_kind, r.p_lo, r.p_hi, r.s_lo, r.s_hi): r
        for r in all_specs()["q_layout_rowgroup_zorder"].fn(spark, SF).collect()
    }


def test_physical_footers_match_the_two_column_manifest(spark):
    """The layout proof at the multi-column granularity: per row group,
    pyarrow footer metadata (num_rows + min/max statistics of BOTH
    probe columns) equals the relational manifest replayed from the
    (zval, l_orderkey, l_linenumber) rule — so the two-column zone map
    the skip decisions use IS the physical layout, on both
    dimensions."""
    import pyarrow.parquet as pq

    layout, zones, _, _, _ = w78.zorder_layout_and_manifest(spark, SF)
    footer_rgs = 0
    for fid in range(w78.ZRG_FILES):
        path = os.path.join(layout, f"file_id={fid}", "part-0.parquet")
        if not os.path.exists(path):
            continue
        meta = pq.ParquetFile(path).metadata
        cols = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }
        pi, si = cols["l_partkey"], cols["l_suppkey"]
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            sp, ss = g.column(pi).statistics, g.column(si).statistics
            assert zones[(fid, rg)] == (
                int(sp.min), int(sp.max), int(ss.min), int(ss.max), g.num_rows
            ), (fid, rg)
        footer_rgs += meta.num_row_groups
    assert footer_rgs == len(zones)
    # multi-row-group files exist (the granularity claim), and every
    # non-terminal row group is full
    assert any(rg > 0 for _, rg in zones)
    for (fid, rg), (_, _, _, _, rws) in zones.items():
        assert rws == w78.ZRG_ROWS or rg == max(
            r for f, r in zones if f == fid
        ), (fid, rg, rws)


def test_zorder_beats_linear_on_secondary_only_probes(spark):
    """THE wave's fact: a single-column (partkey-sorted) layout cannot
    serve suppkey predicates — its row groups span ~the full suppkey
    range, so secondary-only probes scan everything — while the
    Z-order layout reads the sx-bucket slice. And the honest other
    side: on the primary-only probe the linear layout is the tighter
    one (Z-order pays its bucket-granular partkey window)."""
    from weather_flink_spark.io import load

    total = load(spark, SF, "lineitem").count()
    rows = _rows(spark)
    assert len(rows) == len(w78.ZRG_PROBES)
    s_probes = [r for r in rows.values() if r.probe_kind == "s_range"]
    assert len(s_probes) == 2
    for r in s_probes:
        # linear scans ~everything (every row group overlaps)
        assert r.lin_rgs_read == r.lin_rgs_total
        assert r.lin_rows_scanned == total
        # Z-order executes a strict, materially smaller scan (<= 2/3;
        # the 2-sx-bucket probe reads ~half the fixture's 32 coarse
        # row groups — at sf0.1 the ratio is ~7.5x, see the docstring)
        assert r.n_rows_scanned * 3 <= r.lin_rows_scanned * 2, r
        assert 0 < r.n_rgs_read < r.n_rgs_total
    (p,) = [r for r in rows.values() if r.probe_kind == "p_range"]
    assert p.lin_rows_scanned <= p.n_rows_scanned, p
    assert p.lin_rgs_read < p.lin_rgs_total  # linear DOES prune its sort key


def test_executed_scan_found_counts_are_exact(spark):
    """Exact zones mean no false negatives: every probe's executed
    n_rows_found equals the direct full-table box count, and scanned
    bounds found."""
    from pyspark.sql import functions as F

    from weather_flink_spark.io import load

    li = load(spark, SF, "lineitem")
    for r in _rows(spark).values():
        assert r.n_rows_found <= r.n_rows_scanned
        direct = li.filter(
            F.col("l_partkey").between(r.p_lo, r.p_hi)
            & F.col("l_suppkey").between(r.s_lo, r.s_hi)
        ).count()
        assert r.n_rows_found == direct, (r.probe_kind, r.p_lo, r.s_lo)
        assert r.n_rows_found > 0  # every resolved probe bites at this sf
