"""Wave-42: executable compaction/OPTIMIZE — the filesystem facts the
oracle cannot see (file counts, one file per directory, tight parquet
row-group statistics, file-level skipping profile)."""

from __future__ import annotations
import pytest

import glob
import os

import duckdb

from weather_flink_spark.plans import analytics_wave42 as w42
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _parquet_files(d: str) -> list[str]:
    return sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))


@pytest.mark.slow
def test_compaction_binpacks_48_fragments_into_target_files(spark):
    profile = {r.file_id: r for r in all_specs()["q_layout_compact_optimize"].fn(spark, SF).collect()}
    frag_dir, opt_dir = w42.compact_dirs(SF)

    # the fixture really is fragmented: 48 small files in
    assert len(_parquet_files(frag_dir)) == w42.N_FRAGMENTS

    # compacted: one file_id directory per profile row, exactly ONE
    # parquet file per directory (each file_id hashes to one task)
    dirs = sorted(
        d for d in os.listdir(opt_dir) if d.startswith("file_id=")
    )
    assert len(dirs) == len(profile)
    assert len(profile) <= w42.N_TARGET_FILES + 1  # packing slack: <= 1 extra
    for d in dirs:
        files = _parquet_files(os.path.join(opt_dir, d))
        assert len(files) == 1, (d, files)

    # bin-pack balance: cells are atomic in pack_cells_greedy, so the
    # tight guarantee is rows_per_file + (largest single cell - 1) —
    # a file stops admitting new cells once it crosses rows_per_file,
    # and the crossing cell is the only overshoot (the old fixed 2x
    # bound only held because the fixture's histogram was flat —
    # ADVICE r7). Compute the max cell count from the source itself.
    total = sum(r.n_rows for r in profile.values())
    rows_per_file = max(1, -(-total // w42.N_TARGET_FILES))
    con_cells = duckdb.connect()
    max_cell = con_cells.execute(
        f"""
        SELECT MAX(c) FROM (
            SELECT {w42._Z_DUCK} AS zval, COUNT(*) AS c
            FROM read_parquet('{SF}/lineitem.parquet') lineitem
            GROUP BY zval
        )
        """
    ).fetchone()[0]
    for fid, r in profile.items():
        assert r.n_rows <= rows_per_file + max_cell - 1, (
            fid,
            r.n_rows,
            rows_per_file,
            max_cell,
        )

    # nothing lost or duplicated
    con = duckdb.connect()
    src = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert total == src


def test_compacted_layout_prunes_files_and_row_groups(spark):
    """The read-back benefit, both layers:
    - FILE skipping: the per-file px/sx spans (parquet footer min/max,
      cross-checked via duckdb parquet_metadata) let a point predicate
      on EITHER dimension skip a strict subset of files;
    - ROW-GROUP skipping: files carry multiple row groups (1 KiB
      blocks at this test scale) whose zval stats are non-overlapping
      within a file (curve-sorted writes), so a pushed-down predicate
      skips groups.
    """
    all_specs()["q_layout_compact_optimize"].fn(spark, SF).count()
    _, opt_dir = w42.compact_dirs(SF)
    files = _parquet_files(opt_dir)
    con = duckdb.connect()
    quoted = ", ".join(f"'{f}'" for f in files)

    # duckdb sees the real parquet column-chunk stats
    meta = con.execute(
        f"""
        SELECT file_name, row_group_id, path_in_schema,
               CAST(stats_min_value AS BIGINT) AS mn,
               CAST(stats_max_value AS BIGINT) AS mx
        FROM parquet_metadata([{quoted}])
        WHERE path_in_schema IN ('px', 'sx', 'zval')
        """
    ).fetchall()
    assert meta, "no parquet stats found"

    # file-level spans per dimension
    span: dict[tuple[str, str], tuple[int, int]] = {}
    n_groups: dict[str, set[int]] = {}
    for fname, rg, col, mn, mx in meta:
        assert mn is not None and mx is not None, (fname, rg, col)
        k = (fname, col)
        cur = span.get(k)
        span[k] = (mn, mx) if cur is None else (min(cur[0], mn), max(cur[1], mx))
        n_groups.setdefault(fname, set()).add(rg)

    # FILE skipping: for px=3 (and sx=3) only a strict subset of files
    # can contain matches — the z-order property on both dimensions
    for col in ("px", "sx"):
        covering = [
            f for f in files if span[(f, col)][0] <= 3 <= span[(f, col)][1]
        ]
        assert 0 < len(covering) < len(files), (col, len(covering), len(files))

    # ROW-GROUP skipping: at least one file has several row groups and
    # its zval group-stats are pairwise non-overlapping (sorted write),
    # so a zval range predicate reads a strict subset of groups
    multi = [f for f in files if len(n_groups[f]) > 1]
    assert multi, "1 KiB blocks should force multiple row groups"
    checked = 0
    for f in multi:
        zstats = sorted(
            (mn, mx)
            for fname, rg, col, mn, mx in meta
            if fname == f and col == "zval"
        )
        for (mn1, mx1), (mn2, mx2) in zip(zstats, zstats[1:]):
            assert mx1 <= mn2, (f, zstats)  # curve-sorted: no overlap
        checked += 1
    assert checked > 0

    # and Spark pushes the predicate down to that scan
    back = spark.read.parquet(opt_dir).filter("zval = 77")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zval" in plan.split("PushedFilters")[1].split("]")[0], plan[:800]


@pytest.mark.slow
def test_compacted_layout_cuts_bytes_read(spark):
    """END-TO-END bytes proof from Spark's own scan metrics (not just
    footer metadata): a zval-range query routed through the curve's
    file_id mapping reads FEWER files and FEWER bytes than the full
    table, and returns exactly the rows the unpruned filter returns.
    (Spark prunes FILES only via partition values, so the query
    carries the file_id range the bounded cell->file map derives for
    the zval range — exactly how a user targets a curve region.)"""
    all_specs()["q_layout_compact_optimize"].fn(spark, SF).count()
    _, opt_dir = w42.compact_dirs(SF)

    def scan_metrics(df):
        df.collect()
        node = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        m = node.metrics()
        return (
            int(m.apply("numFiles").value()),
            int(m.apply("filesSize").value()),
        )

    full = spark.read.parquet(opt_dir)
    n_files_total, bytes_total = scan_metrics(full)

    # target one curve region: zval in [64, 96) -> its file_id range
    # from the data itself (the bounded cell->file map)
    fmap = {
        r.zval: r.file_id
        for r in full.select("zval", "file_id").distinct().collect()
    }
    fids = sorted({f for z, f in fmap.items() if 64 <= z < 96})
    assert fids, "fixture should populate the probed curve region"
    pruned = full.filter(
        full.file_id.isin(fids) & (full.zval >= 64) & (full.zval < 96)
    )
    n_files_pruned, bytes_pruned = scan_metrics(pruned)

    assert 0 < n_files_pruned < n_files_total, (n_files_pruned, n_files_total)
    assert 0 < bytes_pruned < bytes_total, (bytes_pruned, bytes_total)
    # correctness: the pruned read returns exactly the unpruned answer
    want = full.filter((full.zval >= 64) & (full.zval < 96)).count()
    assert pruned.count() == want and want > 0


def test_partial_fixture_dir_is_rewritten(spark):
    """Fixture reuse is gated on _SUCCESS, not bare dir existence: a
    write that died mid-job leaves a dir without the commit marker, and
    the next call must rebuild rather than silently read the partial
    fixture (r11 advice)."""
    import shutil

    frag_dir, _ = w42.compact_dirs(SF)
    # simulate a mid-write failure: dir exists, no _SUCCESS, bogus file
    shutil.rmtree(frag_dir, ignore_errors=True)
    os.makedirs(frag_dir)
    with open(os.path.join(frag_dir, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    w42.run_compaction(spark, SF).count()
    assert os.path.exists(os.path.join(frag_dir, "_SUCCESS"))
    assert not os.path.exists(os.path.join(frag_dir, "part-junk.parquet"))
    assert len(_parquet_files(frag_dir)) == w42.N_FRAGMENTS
