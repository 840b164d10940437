"""Wave-75 operator (round 11): ROW-GROUP-level data skipping — the
actual lakehouse manifest shape (r10 verdict task #6).

Wave-71 prunes whole FILES via NDV-sized blooms; real parquet pruning
is row-group-granular: a reader consults per-row-group min/max zones
(for range/sort-key predicates) and per-row-group blooms (for point
predicates on high-cardinality scattered keys) from the file footers
and reads only the surviving byte ranges. This entry builds that
manifest and executes the pruned scan at row-group granularity.

``q_layout_rowgroup_skipping``:

1. WRITE: lineitem is laid out as ``RG_FILES`` real parquet files
   (``file_id = l_orderkey % RG_FILES`` hive dirs), each written
   executor-side (applyInPandas per file group) with pyarrow at an
   EXPLICIT ``row_group_size=RG_ROWS`` over rows sorted by the unique
   total order (l_orderkey, l_linenumber) — so row-group membership
   is the deterministic rule ``rg = (row_number_within_file - 1) //
   RG_ROWS`` that BOTH engines can replay, and the physical footers
   must agree with the relational manifest (pinned by a
   footer-equality test via pyarrow metadata — the proof that the
   relational rule IS the storage layout).
2. MANIFEST: per (file, row_group) — min/max of the sort column
   l_orderkey (the zone map), row count, and an NDV-sized seeded-md5
   bloom over l_partkey (the wave-71 sizing rule at row-group
   granularity: 16 bits per distinct key at the largest group, k=2,
   whole 63-bit words, min 4 words). Built relationally FROM THE
   WRITTEN FILES; collected as the manifest sidecar (bounded:
   |row groups| x words — footer-scale, never row-scale).
3. SKIP: point probes on l_partkey prune by BLOOM (min/max is useless
   on a key scattered across the sort order — exactly why parquet
   adds blooms); range probes on l_orderkey prune by ZONE overlap
   ([mn, mx] vs [lo, hi] — exactly where sort-key zones shine). The
   surviving (file, row_group) list is decided BEFORE any read.
4. SCAN: ONE distributed pass serves every probe's pruned lookup
   (``mapInPandas`` over (probe, file, surviving-rg-list) task rows;
   pyarrow ``read_row_groups`` with column pruning; per-probe counts
   grouped back) — the batch-lookup-service shape; a probe surviving
   nowhere never appears in the pass at all. Each output row reports
   (n_rgs_total, n_rgs_read, n_rows_scanned, n_rows_found) where
   ``n_rows_scanned`` is counted FROM THE EXECUTED READ (rows
   materialized before the predicate), and the oracle recomputes the
   same number from its manifest replay — the hash compare therefore
   gates that the physical scan read EXACTLY the row groups the
   manifest said to read, not just that the answers match.

No false negatives (bloom) and exact zones (min/max on the sort key)
mean every probe's ``n_rows_found`` must equal the full-table count
for its predicate — also replayed by the oracle from the raw table.

Scale: the write is one row-scale shuffle + executor-local sorted
writes; the manifest is footer-sized (at 100 TB: ~1 row group per
128 MB — the manifest stays millions of rows for billions of data
rows, the Iceberg/Delta stats-file shape); each probe reads only
surviving byte ranges. Row-group zones + blooms are what make point
and range lookups sub-file-granular at scale.

Reference parity note: the reference manages no storage layout (empty
plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave17 import (
    _BH1,
    _BH1_D,
    _BH2,
    _BH2_D,
)
from weather_flink_spark.plans.registry import register

RG_FILES = 4
# point probes on l_partkey: one ubiquitous key (the honest "bloom
# cannot prune a key present in ~every row group" row — ONE such probe
# carries the fact; a second would just re-run a near-full executed
# scan) + the three absent keys that measure the real fpp
RG_POINT_PROBES = (2, 100000, 100001, 100002)
RG_ROWS = 512  # explicit pyarrow row_group_size: deterministic splits
RG_BITS_PER_KEY = 16  # k=2 hashes -> fpp ~1.4% (the wave-71 rule)
RG_MIN_WORDS = 4

# range probes on the SORT column (zone-map territory); the last one
# is empty at every sf (orderkeys are bounded by ~150k at sf0.1)
RG_RANGE_PROBES = ((0, 40), (700, 760), (2_000_000, 2_000_100))


def rowgroup_dir(sf_dir: str) -> str:
    """Deterministic collision-free layout dir (wave-42 discipline)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"wfs_rgskip_{os.getpid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def write_rowgroup_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem as RG_FILES hive-dir parquet files, each with
    explicit RG_ROWS-row row groups over (l_orderkey, l_linenumber)-
    sorted rows — executor-side pyarrow writes (one task per file), so
    the row-group boundaries are the replayable rule, not a size
    heuristic."""
    d = rowgroup_dir(sf_dir)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % RG_FILES).alias("file_id"),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values(
            ["l_orderkey", "l_linenumber"], kind="mergesort"
        ).reset_index(drop=True)
        sub = os.path.join(d, f"file_id={fid}")
        os.makedirs(sub, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                pdf.drop(columns=["file_id"]), preserve_index=False
            ),
            os.path.join(sub, "part-0.parquet"),
            row_group_size=RG_ROWS,
        )
        n = len(pdf)
        return pd.DataFrame(
            {"file_id": [fid], "n_rows": [n], "n_rgs": [(n + RG_ROWS - 1) // RG_ROWS]}
        )

    written = (
        li.repartition(RG_FILES, "file_id")
        .groupBy("file_id")
        .applyInPandas(
            write_group, "file_id int, n_rows bigint, n_rgs bigint"
        )
    )
    written.count()  # force the writes
    return d


def rowgroup_manifest(spark: SparkSession, layout_dir: str):
    """(zones, bits, blooms): the relational manifest FROM THE WRITTEN
    FILES. zones = {(file, rg): (mn, mx, rows)}; blooms = {(file, rg):
    [words]}; bits = the NDV-sized bloom width. Bounded collects:
    |row groups| x (2 + words) values — the footer/stats artifact."""
    back = spark.read.parquet(layout_dir)
    w = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber")
    ranked = back.withColumn(
        "rg", ((F.row_number().over(w) - F.lit(1)) / RG_ROWS).cast("int")
    )
    zones = {
        (int(r.file_id), int(r.rg)): (int(r.mn), int(r.mx), int(r.rws))
        for r in ranked.groupBy("file_id", "rg")
        .agg(
            F.min("l_orderkey").alias("mn"),
            F.max("l_orderkey").alias("mx"),
            F.count("*").alias("rws"),
        )
        .collect()
    }
    keys = ranked.select("file_id", "rg", F.col("l_partkey").alias("k")).distinct()
    ndv_max = (
        keys.groupBy("file_id", "rg")
        .agg(F.count("*").alias("ndv"))
        .agg(F.max("ndv").alias("m"))
        .collect()[0]["m"]
    )
    n_words = max(RG_MIN_WORDS, (RG_BITS_PER_KEY * int(ndv_max) + 62) // 63)
    bits = 63 * n_words
    h1 = F.expr(_BH1.format(k="k", bits=bits))
    h2 = F.expr(_BH2.format(k="k", bits=bits))
    words = (
        keys.select("file_id", "rg", F.explode(F.array(h1, h2)).alias("pos"))
        .groupBy("file_id", "rg", F.expr("pos div 63").alias("widx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int)))"
            ).alias("w")
        )
    )
    blooms: dict[tuple[int, int], list[int]] = {}
    for r in words.collect():
        blooms.setdefault((int(r.file_id), int(r.rg)), [0] * n_words)[
            int(r.widx)
        ] = int(r.w)
    for key in zones:
        blooms.setdefault(key, [0] * n_words)
    return zones, bits, blooms


def _point_positions(spark: SparkSession, bits: int) -> dict[int, list[int]]:
    probes = spark.createDataFrame([(p,) for p in RG_POINT_PROBES], "p bigint")
    ph1 = F.expr(_BH1.format(k="p", bits=bits))
    ph2 = F.expr(_BH2.format(k="p", bits=bits))
    return {
        int(r.p): [int(r.pos1), int(r.pos2)]
        for r in probes.select("p", ph1.alias("pos1"), ph2.alias("pos2")).collect()
    }


def _pruned_read_all(
    spark: SparkSession,
    layout_dir: str,
    probes: list[tuple[str, int, int, list[tuple[int, int]]]],
) -> DataFrame:
    """ONE distributed scan pass serving EVERY probe's pruned lookup —
    the batch-lookup-service shape (r11: the first cut launched one
    Spark job per probe; at 7 probes that is 7x the job overhead for
    the same bytes). Task rows are (probe, file, surviving-rg-list):
    one pyarrow file open per (probe, file), ``read_row_groups`` with
    column pruning, per-probe (scanned, found) counted FROM THE
    EXECUTED READ and grouped back per probe."""
    task_rows = []
    for kind, lo, hi, keep in probes:
        by_file: dict[int, list[int]] = {}
        for fid, rg in keep:
            by_file.setdefault(fid, []).append(rg)
        pred = (
            f"l_partkey = {lo}"
            if kind == "point"
            else f"l_orderkey BETWEEN {lo} AND {hi}"
        )
        for fid, rgs in sorted(by_file.items()):
            task_rows.append(
                (
                    kind,
                    lo,
                    hi,
                    pred,
                    os.path.join(layout_dir, f"file_id={fid}", "part-0.parquet"),
                    sorted(rgs),
                )
            )
    tasks = spark.createDataFrame(
        task_rows,
        "probe_kind string, probe_lo bigint, probe_hi bigint, "
        "pred string, path string, rgs array<int>",
    )

    def read_rgs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import duckdb
        import pyarrow.parquet as pq

        for batch in batches:
            for kind, lo, hi, pred, path, rgs in zip(
                batch["probe_kind"],
                batch["probe_lo"],
                batch["probe_hi"],
                batch["pred"],
                batch["path"],
                batch["rgs"],
            ):
                t = pq.ParquetFile(path).read_row_groups(
                    [int(r) for r in rgs], columns=["l_orderkey", "l_partkey"]
                )
                found = duckdb.arrow(t).filter(pred).count("*").fetchone()[0]
                yield pd.DataFrame(
                    {
                        "probe_kind": [kind],
                        "probe_lo": [lo],
                        "probe_hi": [hi],
                        "scanned": [t.num_rows],
                        "found": [int(found)],
                    }
                )

    return (
        tasks.mapInPandas(
            read_rgs,
            "probe_kind string, probe_lo bigint, probe_hi bigint, "
            "scanned bigint, found bigint",
        )
        .groupBy("probe_kind", "probe_lo", "probe_hi")
        .agg(
            F.sum("scanned").cast("bigint").alias("n_rows_scanned"),
            F.sum("found").cast("bigint").alias("n_rows_found"),
        )
    )


def rowgroup_layout_and_manifest(spark: SparkSession, sf_dir: str):
    """Session-cached (layout_dir, zones, bits, blooms): the written
    layout and its manifest are materialized ARTIFACTS (a lakehouse
    writes them once and amortizes across queries — the pq_codes/
    kmeans_final session-cache discipline), not per-query work."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build():
        layout = write_rowgroup_layout(spark, sf_dir)
        zones, bits, blooms = rowgroup_manifest(spark, layout)
        return layout, zones, bits, blooms

    return _cached("rowgroup_layout", spark, sf_dir, build)


def run_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    layout, zones, bits, blooms = rowgroup_layout_and_manifest(spark, sf_dir)
    pos = _point_positions(spark, bits)
    all_rgs = sorted(zones)
    probes: list[tuple[str, int, int, list[tuple[int, int]]]] = []
    for p in RG_POINT_PROBES:  # bloom decision (point key, scattered col)
        keep = [
            key
            for key in all_rgs
            if all(
                (blooms[key][b // 63] >> (b % 63)) & 1 for b in pos[int(p)]
            )
        ]
        probes.append(("point", int(p), int(p), keep))
    for lo, hi in RG_RANGE_PROBES:  # zone decision (sort col)
        keep = [
            key for key in all_rgs if zones[key][0] <= hi and zones[key][1] >= lo
        ]
        probes.append(("range", lo, hi, keep))
    # one head row per probe (totals + the BEFORE-read skip decision);
    # probes pruned everywhere never appear in the scan pass at all
    head = spark.createDataFrame(
        [(kind, lo, hi, len(all_rgs), len(keep)) for kind, lo, hi, keep in probes],
        "probe_kind string, probe_lo bigint, probe_hi bigint, "
        "n_rgs_total bigint, n_rgs_read bigint",
    )
    surviving = [p for p in probes if p[3]]
    scanned = _pruned_read_all(spark, layout, surviving)
    return (
        head.join(
            F.broadcast(scanned), ["probe_kind", "probe_lo", "probe_hi"], "left"
        )
        .fillna(0, subset=["n_rows_scanned", "n_rows_found"])
        .select(
            "probe_kind",
            "probe_lo",
            "probe_hi",
            "n_rgs_total",
            "n_rgs_read",
            "n_rows_scanned",
            "n_rows_found",
        )
    )


_POINT_LIST = ", ".join(str(p) for p in RG_POINT_PROBES)
_RANGE_LIST = ", ".join(f"({lo}, {hi})" for lo, hi in RG_RANGE_PROBES)


def _rowgroup_oracle() -> str:
    b = "(SELECT bits FROM bsz)"
    return f"""
        WITH ranked AS (
            SELECT l_orderkey % {RG_FILES} AS file_id, l_orderkey,
                   l_partkey,
                   (ROW_NUMBER() OVER (
                        PARTITION BY l_orderkey % {RG_FILES}
                        ORDER BY l_orderkey, l_linenumber) - 1)
                       // {RG_ROWS} AS rg
            FROM lineitem
        ),
        zones AS MATERIALIZED (
            SELECT file_id, rg, MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx,
                   CAST(COUNT(*) AS BIGINT) AS rws
            FROM ranked GROUP BY 1, 2
        ),
        rgkeys AS MATERIALIZED (
            SELECT DISTINCT file_id, rg, l_partkey AS k FROM ranked
        ),
        bsz AS (
            SELECT 63 * GREATEST({RG_MIN_WORDS},
                       ({RG_BITS_PER_KEY} * MAX(ndv) + 62) // 63) AS bits
            FROM (SELECT COUNT(*) AS ndv FROM rgkeys GROUP BY file_id, rg)
        ),
        words AS MATERIALIZED (
            SELECT file_id, rg, pos // 63 AS widx,
                   BIT_OR(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS w
            FROM (
                SELECT file_id, rg, UNNEST([
                    {_BH1_D.format(k="k", bits=b)},
                    {_BH2_D.format(k="k", bits=b)}]) AS pos
                FROM rgkeys
            ) GROUP BY 1, 2, 3
        ),
        probe_bits AS (
            SELECT p, pos // 63 AS widx,
                   1::BIGINT << CAST(pos % 63 AS INTEGER) AS mask
            FROM (
                SELECT p, UNNEST([
                    {_BH1_D.format(k="p", bits=b)},
                    {_BH2_D.format(k="p", bits=b)}]) AS pos
                FROM (SELECT UNNEST([{_POINT_LIST}]) AS p)
            )
        ),
        point_member AS (
            SELECT z.file_id, z.rg, z.rws, pb.p,
                   BOOL_AND(w.w IS NOT NULL
                            AND (w.w & pb.mask) = pb.mask) AS member
            FROM zones z
            CROSS JOIN probe_bits pb
            LEFT JOIN words w
              ON w.file_id = z.file_id AND w.rg = z.rg AND w.widx = pb.widx
            GROUP BY z.file_id, z.rg, z.rws, pb.p
        ),
        pcounts AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        point_rows AS (
            SELECT 'point' AS probe_kind,
                   CAST(m.p AS BIGINT) AS probe_lo,
                   CAST(m.p AS BIGINT) AS probe_hi,
                   CAST((SELECT COUNT(*) FROM zones) AS BIGINT) AS n_rgs_total,
                   CAST(SUM(CASE WHEN m.member THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_rgs_read,
                   CAST(COALESCE(SUM(CASE WHEN m.member THEN m.rws END), 0)
                       AS BIGINT) AS n_rows_scanned,
                   CAST(COALESCE(MAX(c.c), 0) AS BIGINT) AS n_rows_found
            FROM point_member m
            LEFT JOIN pcounts c ON c.k = m.p
            GROUP BY m.p
        ),
        ranges AS (
            SELECT lo, hi FROM (VALUES {_RANGE_LIST}) AS t(lo, hi)
        ),
        range_rows AS (
            SELECT 'range' AS probe_kind,
                   CAST(r.lo AS BIGINT) AS probe_lo,
                   CAST(r.hi AS BIGINT) AS probe_hi,
                   CAST((SELECT COUNT(*) FROM zones) AS BIGINT) AS n_rgs_total,
                   CAST(SUM(CASE WHEN z.mn <= r.hi AND z.mx >= r.lo
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_rgs_read,
                   CAST(COALESCE(SUM(CASE WHEN z.mn <= r.hi AND z.mx >= r.lo
                            THEN z.rws END), 0) AS BIGINT) AS n_rows_scanned,
                   CAST((SELECT COUNT(*) FROM lineitem
                         WHERE l_orderkey BETWEEN r.lo AND r.hi) AS BIGINT)
                       AS n_rows_found
            FROM ranges r CROSS JOIN zones z
            GROUP BY r.lo, r.hi
        )
        SELECT * FROM point_rows
        UNION ALL SELECT * FROM range_rows
    """


@register(
    "q_layout_rowgroup_skipping",
    oracle=_rowgroup_oracle(),
    doc=(
        "ROW-GROUP-level data skipping (r11, r10 verdict task #6 — "
        "wave-71's file pruning taken to the real lakehouse manifest "
        "granularity): lineitem written as 4 hive-dir parquet files "
        "with EXPLICIT 512-row row groups (executor-side pyarrow "
        "writes over (l_orderkey,l_linenumber)-sorted rows, so the "
        "boundary rule is replayable and footer-equality-tested); per "
        "(file,row_group) manifest = l_orderkey min/max zones + row "
        "count + NDV-sized seeded-md5 bloom over l_partkey; point "
        "probes prune by BLOOM (min/max is useless on a scattered "
        "key), range probes on the sort column prune by ZONE overlap; "
        "each probe then reads ONLY surviving row groups via a "
        "distributed pyarrow read_row_group scan with column pruning. "
        "n_rows_scanned is counted FROM THE EXECUTED READ and the "
        "oracle recomputes it from its own manifest replay — the hash "
        "compare proves the physical scan read exactly the row groups "
        "the manifest decided, and no-false-negative/exact-zone "
        "semantics pin every n_rows_found to the full-table count. "
        "Scale: manifest is footer-sized (stats-file shape), probes "
        "read only surviving byte ranges."
    ),
    tags=("layout", "scan", "sink", "scale", "pandas-udf"),
)
def q_layout_rowgroup_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_rowgroup_skipping(spark, sf_dir)
