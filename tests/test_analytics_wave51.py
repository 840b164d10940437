"""Wave-51: 3-column Z-order compaction — triple-predicate file
pruning from real parquet footers (the r7 verdict's stretch #8
done-bar: show a predicate on ANY of the three columns prunes)."""

from __future__ import annotations

import glob
import os

import duckdb

from weather_flink_spark.plans import analytics_wave51 as w51
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _parquet_files(d: str) -> list[str]:
    return sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))


def test_zorder3_compacts_and_prunes_on_all_three_dims(spark):
    profile = {
        r.file_id: r
        for r in all_specs()["q_layout_compact_zorder3"].fn(spark, SF).collect()
    }
    frag_dir, opt_dir = w51.compact3_dirs(SF)
    assert len(_parquet_files(frag_dir)) == w51.N_FRAGMENTS
    files = _parquet_files(opt_dir)
    assert len(files) == len(profile)
    assert len(profile) <= w51.N_TARGET_FILES + 1  # packing slack

    con = duckdb.connect()
    quoted = ", ".join(f"'{f}'" for f in files)
    meta = con.execute(
        f"""
        SELECT file_name, path_in_schema,
               CAST(stats_min_value AS BIGINT) AS mn,
               CAST(stats_max_value AS BIGINT) AS mx
        FROM parquet_metadata([{quoted}])
        WHERE path_in_schema IN ('px', 'sx', 'ox')
        """
    ).fetchall()
    assert meta
    span: dict[tuple[str, str], tuple[int, int]] = {}
    for fname, col, mn, mx in meta:
        k = (fname, col)
        cur = span.get(k)
        span[k] = (mn, mx) if cur is None else (min(cur[0], mn), max(cur[1], mx))

    # TRIPLE-predicate pruning: a point predicate on EACH of the three
    # interleaved dimensions admits only a strict subset of files —
    # the whole point of the 3-way curve (a 1-column sort would only
    # prune on its leading column)
    for col in ("px", "sx", "ox"):
        covering = [
            f for f in files if span[(f, col)][0] <= 3 <= span[(f, col)][1]
        ]
        assert 0 < len(covering) < len(files), (col, len(covering), len(files))

    # nothing lost or duplicated vs the source
    total = sum(r.n_rows for r in profile.values())
    src = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert total == src

    # footer spans agree with the profile the entry computed from the
    # read-back table (two independent paths to the same facts)
    for fid, r in profile.items():
        d = os.path.join(opt_dir, f"file_id={fid}")
        (f,) = _parquet_files(d)
        assert span[(f, "px")] == (r.px_min, r.px_max)
        assert span[(f, "sx")] == (r.sx_min, r.sx_max)
        assert span[(f, "ox")] == (r.ox_min, r.ox_max)
