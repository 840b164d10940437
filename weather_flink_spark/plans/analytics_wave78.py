"""Wave-78 operator (round 11): MULTI-COLUMN row-group skipping — the
Z-order wave at row-group granularity (the residual wave-75 named).

Wave-75 proved row-group-granular pruning on ONE sort column (zones)
plus ONE bloom column; real lakehouse OPTIMIZE ZORDER exists because a
single sort order can serve only one dimension: a layout sorted by
l_partkey gives razor-thin partkey zones and USELESS suppkey zones
(every row group spans ~the full suppkey range). Z-order (wave-14's
Morton interleave, here driven down to physical row groups) keeps the
per-row-group min/max window narrow on BOTH dimensions at once, which
is exactly what multi-column zone maps need.

``q_layout_rowgroup_zorder``:

1. WRITE: lineitem bucketizes both dimensions range-preservingly
   (``px = l_partkey*16 div (max_pk+1)``, same for ``sx`` — monotone
   in the raw key, so raw-value range predicates map to bucket
   ranges), Morton-interleaves them into ``zval`` (wave-14's
   ``_z_value_sql``), and is laid out as 16 hive-dir parquet files
   (``file_id = zval div 16`` — each file a 4x4 bucket block) written
   executor-side with pyarrow at an EXPLICIT ``ZRG_ROWS``-row
   row-group size over rows sorted by the unique total order
   ``(zval, l_orderkey, l_linenumber)`` — row-group membership is a
   deterministic rule both engines replay, and a footer-equality test
   pins that the physical footers (num_rows + min/max stats on BOTH
   probe columns) agree with the relational manifest.
2. MANIFEST: per (file, row_group) — min/max of l_partkey AND
   l_suppkey plus row count: the two-column zone map. Bounded collect
   (|row groups| x 5 values — footer-scale).
3. COUNTERFACTUAL: the SAME rows under the single-column layout a
   plain ``OPTIMIZE ... ORDER BY l_partkey`` would produce (16 files
   range-partitioned by px, sorted within by (l_partkey, l_suppkey,
   l_orderkey, l_linenumber), identical row-group size) — manifest
   math only, no second physical write: per-probe ``lin_rgs_read`` /
   ``lin_rows_scanned`` columns quantify what the linear layout WOULD
   scan, replayed identically by the oracle.
4. SKIP + SCAN: probes are primary-only ranges, SECONDARY-only ranges
   (the case a single sort order cannot serve), and 2-D boxes, all
   resolved as integer percent fractions of each key's max so they
   bite at every sf. Surviving (file, row_group) lists are decided
   from the zone manifest BEFORE any read; ONE distributed
   ``mapInPandas``/``read_row_groups`` pass (the wave-75 batch-lookup
   shape) serves every surviving probe with column pruning, and
   ``n_rows_scanned`` is counted FROM THE EXECUTED READ while the
   oracle recomputes it from its manifest replay — the hash compare
   gates that the physical scan read exactly the row groups the
   two-column zones decided.

Exact zones mean no false negatives: every probe's ``n_rows_found``
equals the full-table count for its box predicate (oracle-replayed
from raw lineitem).

The fact this wave publishes (measured, pinned in tests): on
secondary-only probes the linear layout scans ~the whole table (every
linear row group spans ~the full suppkey range) while the Z-order
layout scans the sx-bucket slice; on primary-only probes linear is
the tighter layout (Z-order pays its bucket-granular px window) —
the classic Z-order trade, now at row-group granularity with executed
scans.

Scale: one row-scale shuffle + 16 executor-local sorted writes; both
manifests are footer-scale (at 100 TB: ~1 row per 128 MB row group —
the Iceberg/Delta stats-file shape; the driver-side keep-list math
here is the planner's manifest pass); probes read only surviving byte
ranges.

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
from weather_flink_spark.plans.analytics_wave14 import _z_value_sql
from weather_flink_spark.plans.registry import register

ZRG_FILES = 16  # zval div 16: one 4x4 (px, sx) bucket block per file
ZRG_ROWS = 256  # explicit pyarrow row_group_size: deterministic splits
ZRG_BUCKETS = 16  # 4 bits per dimension (the wave-14 grid)

# probes as integer-percent fractions of each key's max (resolved as
# lo = max*pct_lo // 100 in BOTH engines): primary-only, the two
# secondary-only ranges a single sort order cannot serve, and 2-D
# boxes. None = unconstrained dimension (resolves to [0, max]).
ZRG_PROBES: tuple[tuple[str, tuple[int, int] | None, tuple[int, int] | None], ...] = (
    ("p_range", (25, 31), None),
    ("s_range", None, (50, 56)),
    ("s_range", None, (80, 86)),
    ("box", (25, 31), (50, 56)),
    ("box", (70, 76), (10, 16)),
)

_PX = f"(l_partkey * {ZRG_BUCKETS}) div (%(mp)d + 1)"
_SX = f"(l_suppkey * {ZRG_BUCKETS}) div (%(ms)d + 1)"


def zorder_rowgroup_dir(sf_dir: str) -> str:
    """Deterministic collision-free layout dir (wave-42 discipline)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"wfs_rgz_{os.getpid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def _key_maxes(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    r = (
        load(spark, sf_dir, "lineitem")
        .agg(F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms"))
        .collect()[0]
    )
    return int(r.mp), int(r.ms)


def write_zorder_layout(spark: SparkSession, sf_dir: str, mp: int, ms: int) -> str:
    """Write lineitem as ZRG_FILES hive-dir parquet files, each holding
    one 4x4 Morton block, rows sorted by (zval, l_orderkey,
    l_linenumber) with explicit ZRG_ROWS-row row groups — executor-side
    pyarrow writes so the boundary rule is replayable arithmetic."""
    d = zorder_rowgroup_dir(sf_dir)
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    px = _PX % {"mp": mp}
    sx = _SX % {"ms": ms}
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.expr(px).alias("px"),
            F.expr(sx).alias("sx"),
        )
        .withColumn("zval", F.expr(_z_value_sql("px", "sx", "div")))
        .withColumn("file_id", F.expr(f"zval div {ZRG_BUCKETS}"))
        .drop("px", "sx")
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fid = int(pdf["file_id"].iloc[0])
        pdf = pdf.sort_values(
            ["zval", "l_orderkey", "l_linenumber"], kind="mergesort"
        ).reset_index(drop=True)
        sub = os.path.join(d, f"file_id={fid}")
        os.makedirs(sub, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(
                pdf.drop(columns=["file_id"]), preserve_index=False
            ),
            os.path.join(sub, "part-0.parquet"),
            row_group_size=ZRG_ROWS,
        )
        return pd.DataFrame({"file_id": [fid], "n_rows": [len(pdf)]})

    written = (
        li.repartition(ZRG_FILES, "file_id")
        .groupBy("file_id")
        .applyInPandas(write_group, "file_id int, n_rows bigint")
    )
    written.count()  # force the writes
    return d


def zorder_manifest(
    spark: SparkSession, layout_dir: str
) -> dict[tuple[int, int], tuple[int, int, int, int, int]]:
    """{(file, rg): (pk_mn, pk_mx, sk_mn, sk_mx, rows)} — the
    two-column zone map FROM THE WRITTEN FILES. Ordering by the sort
    key reconstructs physical row order regardless of read splits
    (the wave-75 rule). Bounded collect: |row groups| x 5 values."""
    back = spark.read.parquet(layout_dir)
    w = Window.partitionBy("file_id").orderBy("zval", "l_orderkey", "l_linenumber")
    ranked = back.withColumn(
        "rg", ((F.row_number().over(w) - F.lit(1)) / ZRG_ROWS).cast("int")
    )
    return {
        (int(r.file_id), int(r.rg)): (
            int(r.pk_mn), int(r.pk_mx), int(r.sk_mn), int(r.sk_mx), int(r.rws)
        )
        for r in ranked.groupBy("file_id", "rg")
        .agg(
            F.min("l_partkey").alias("pk_mn"),
            F.max("l_partkey").alias("pk_mx"),
            F.min("l_suppkey").alias("sk_mn"),
            F.max("l_suppkey").alias("sk_mx"),
            F.count("*").alias("rws"),
        )
        .collect()
    }


def linear_manifest(
    spark: SparkSession, sf_dir: str, mp: int
) -> dict[tuple[int, int], tuple[int, int, int, int, int]]:
    """The counterfactual single-column layout's zone map — manifest
    math only (no physical write): 16 files range-partitioned by px
    (what OPTIMIZE ... ORDER BY l_partkey produces), sorted within by
    (l_partkey, l_suppkey, l_orderkey, l_linenumber), same row-group
    size. Same bounded-collect shape as the Z manifest."""
    px = _PX % {"mp": mp}
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        F.expr(px).alias("lf"),
    )
    w = Window.partitionBy("lf").orderBy(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    ranked = li.withColumn(
        "rg", ((F.row_number().over(w) - F.lit(1)) / ZRG_ROWS).cast("int")
    )
    return {
        (int(r.lf), int(r.rg)): (
            int(r.pk_mn), int(r.pk_mx), int(r.sk_mn), int(r.sk_mx), int(r.rws)
        )
        for r in ranked.groupBy("lf", "rg")
        .agg(
            F.min("l_partkey").alias("pk_mn"),
            F.max("l_partkey").alias("pk_mx"),
            F.min("l_suppkey").alias("sk_mn"),
            F.max("l_suppkey").alias("sk_mx"),
            F.count("*").alias("rws"),
        )
        .collect()
    }


def zorder_layout_and_manifest(spark: SparkSession, sf_dir: str):
    """Session-cached (layout_dir, zones, lin_zones, mp, ms) — written
    layout + both manifests are amortized artifacts (the wave-75
    discipline)."""
    from weather_flink_spark.plans.llm_pipeline import _cached

    def build():
        mp, ms = _key_maxes(spark, sf_dir)
        layout = write_zorder_layout(spark, sf_dir, mp, ms)
        return layout, zorder_manifest(spark, layout), linear_manifest(
            spark, sf_dir, mp
        ), mp, ms

    return _cached("rowgroup_zorder_layout", spark, sf_dir, build)


def _resolve_probes(
    mp: int, ms: int
) -> list[tuple[str, int, int, int, int]]:
    out = []
    for kind, p_pct, s_pct in ZRG_PROBES:
        p_lo, p_hi = (
            (mp * p_pct[0] // 100, mp * p_pct[1] // 100) if p_pct else (0, mp)
        )
        s_lo, s_hi = (
            (ms * s_pct[0] // 100, ms * s_pct[1] // 100) if s_pct else (0, ms)
        )
        out.append((kind, p_lo, p_hi, s_lo, s_hi))
    return out


def _pruned_box_read(
    spark: SparkSession,
    layout_dir: str,
    probes: list[tuple[tuple[str, int, int, int, int], list[tuple[int, int]]]],
) -> DataFrame:
    """ONE distributed scan pass serving every surviving probe's pruned
    2-D box lookup (wave-75's batch-lookup-service shape): task rows
    are (probe, file, surviving-rg-list); pyarrow read_row_groups with
    column pruning; per-probe (scanned, found) counted FROM THE
    EXECUTED READ."""
    task_rows = []
    for (kind, p_lo, p_hi, s_lo, s_hi), keep in probes:
        by_file: dict[int, list[int]] = {}
        for fid, rg in keep:
            by_file.setdefault(fid, []).append(rg)
        pred = (
            f"l_partkey BETWEEN {p_lo} AND {p_hi} "
            f"AND l_suppkey BETWEEN {s_lo} AND {s_hi}"
        )
        for fid, rgs in sorted(by_file.items()):
            task_rows.append(
                (
                    kind, p_lo, p_hi, s_lo, s_hi, pred,
                    os.path.join(layout_dir, f"file_id={fid}", "part-0.parquet"),
                    sorted(rgs),
                )
            )
    tasks = spark.createDataFrame(
        task_rows,
        "probe_kind string, p_lo bigint, p_hi bigint, s_lo bigint, "
        "s_hi bigint, pred string, path string, rgs array<int>",
    )

    def read_rgs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import duckdb
        import pyarrow.parquet as pq

        for batch in batches:
            for kind, p_lo, p_hi, s_lo, s_hi, pred, path, rgs in zip(
                batch["probe_kind"], batch["p_lo"], batch["p_hi"],
                batch["s_lo"], batch["s_hi"], batch["pred"],
                batch["path"], batch["rgs"],
            ):
                t = pq.ParquetFile(path).read_row_groups(
                    [int(r) for r in rgs], columns=["l_partkey", "l_suppkey"]
                )
                found = duckdb.arrow(t).filter(pred).count("*").fetchone()[0]
                yield pd.DataFrame(
                    {
                        "probe_kind": [kind],
                        "p_lo": [p_lo], "p_hi": [p_hi],
                        "s_lo": [s_lo], "s_hi": [s_hi],
                        "scanned": [t.num_rows],
                        "found": [int(found)],
                    }
                )

    return (
        tasks.mapInPandas(
            read_rgs,
            "probe_kind string, p_lo bigint, p_hi bigint, s_lo bigint, "
            "s_hi bigint, scanned bigint, found bigint",
        )
        .groupBy("probe_kind", "p_lo", "p_hi", "s_lo", "s_hi")
        .agg(
            F.sum("scanned").cast("bigint").alias("n_rows_scanned"),
            F.sum("found").cast("bigint").alias("n_rows_found"),
        )
    )


def _overlaps(
    zone: tuple[int, int, int, int, int],
    p_lo: int, p_hi: int, s_lo: int, s_hi: int,
) -> bool:
    pk_mn, pk_mx, sk_mn, sk_mx, _ = zone
    return pk_mn <= p_hi and pk_mx >= p_lo and sk_mn <= s_hi and sk_mx >= s_lo


def run_rowgroup_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    layout, zones, lin_zones, mp, ms = zorder_layout_and_manifest(spark, sf_dir)
    resolved = _resolve_probes(mp, ms)
    survived = []
    head_rows = []
    for probe in resolved:
        kind, p_lo, p_hi, s_lo, s_hi = probe
        keep = [k for k, z in sorted(zones.items()) if _overlaps(z, *probe[1:])]
        lin_keep = [
            z for _, z in sorted(lin_zones.items()) if _overlaps(z, *probe[1:])
        ]
        head_rows.append(
            (
                kind, p_lo, p_hi, s_lo, s_hi,
                len(zones), len(keep),
                len(lin_zones), len(lin_keep),
                sum(z[4] for z in lin_keep),
            )
        )
        if keep:
            survived.append((probe, keep))
    head = spark.createDataFrame(
        head_rows,
        "probe_kind string, p_lo bigint, p_hi bigint, s_lo bigint, "
        "s_hi bigint, n_rgs_total bigint, n_rgs_read bigint, "
        "lin_rgs_total bigint, lin_rgs_read bigint, lin_rows_scanned bigint",
    )
    scanned = _pruned_box_read(spark, layout, survived)
    return (
        head.join(
            F.broadcast(scanned),
            ["probe_kind", "p_lo", "p_hi", "s_lo", "s_hi"],
            "left",
        )
        .fillna(0, subset=["n_rows_scanned", "n_rows_found"])
        .select(
            "probe_kind", "p_lo", "p_hi", "s_lo", "s_hi",
            "n_rgs_total", "n_rgs_read", "n_rows_scanned", "n_rows_found",
            "lin_rgs_total", "lin_rgs_read", "lin_rows_scanned",
        )
    )


def _probe_values() -> str:
    rows = []
    for kind, p_pct, s_pct in ZRG_PROBES:
        p_lo = "CAST(NULL AS INTEGER)" if p_pct is None else str(p_pct[0])
        p_hi = "CAST(NULL AS INTEGER)" if p_pct is None else str(p_pct[1])
        s_lo = "CAST(NULL AS INTEGER)" if s_pct is None else str(s_pct[0])
        s_hi = "CAST(NULL AS INTEGER)" if s_pct is None else str(s_pct[1])
        rows.append(f"('{kind}', {p_lo}, {p_hi}, {s_lo}, {s_hi})")
    return ", ".join(rows)


def _rowgroup_zorder_oracle() -> str:
    # the Spark side injects collected maxes as literals; the oracle
    # derives the same bounds from scalar subqueries over the data
    px = f"(l_partkey * {ZRG_BUCKETS}) // ((SELECT mp FROM mx) + 1)"
    sx = f"(l_suppkey * {ZRG_BUCKETS}) // ((SELECT ms FROM mx) + 1)"
    zv = _z_value_sql("px", "sx", "//")
    return f"""
        WITH mx AS (
            SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms FROM lineitem
        ),
        zbase AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, px, sx,
                   {zv} AS zval
            FROM (
                SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                       {px} AS px, {sx} AS sx
                FROM lineitem
            )
        ),
        zzones AS MATERIALIZED (
            SELECT file_id, rg,
                   MIN(l_partkey) AS pk_mn, MAX(l_partkey) AS pk_mx,
                   MIN(l_suppkey) AS sk_mn, MAX(l_suppkey) AS sk_mx,
                   CAST(COUNT(*) AS BIGINT) AS rws
            FROM (
                SELECT *, zval // {ZRG_BUCKETS} AS file_id,
                       (ROW_NUMBER() OVER (
                            PARTITION BY zval // {ZRG_BUCKETS}
                            ORDER BY zval, l_orderkey, l_linenumber) - 1)
                           // {ZRG_ROWS} AS rg
                FROM zbase
            ) GROUP BY 1, 2
        ),
        lzones AS MATERIALIZED (
            SELECT lf, rg,
                   MIN(l_partkey) AS pk_mn, MAX(l_partkey) AS pk_mx,
                   MIN(l_suppkey) AS sk_mn, MAX(l_suppkey) AS sk_mx,
                   CAST(COUNT(*) AS BIGINT) AS rws
            FROM (
                SELECT *, px AS lf,
                       (ROW_NUMBER() OVER (
                            PARTITION BY px
                            ORDER BY l_partkey, l_suppkey,
                                     l_orderkey, l_linenumber) - 1)
                           // {ZRG_ROWS} AS rg
                FROM zbase
            ) GROUP BY 1, 2
        ),
        probes AS (
            SELECT kind AS probe_kind,
                   CAST(COALESCE((SELECT mp FROM mx) * p_lo_pct // 100, 0)
                       AS BIGINT) AS p_lo,
                   CAST(COALESCE((SELECT mp FROM mx) * p_hi_pct // 100,
                                 (SELECT mp FROM mx)) AS BIGINT) AS p_hi,
                   CAST(COALESCE((SELECT ms FROM mx) * s_lo_pct // 100, 0)
                       AS BIGINT) AS s_lo,
                   CAST(COALESCE((SELECT ms FROM mx) * s_hi_pct // 100,
                                 (SELECT ms FROM mx)) AS BIGINT) AS s_hi
            FROM (VALUES {_probe_values()})
                 AS t(kind, p_lo_pct, p_hi_pct, s_lo_pct, s_hi_pct)
        )
        SELECT p.probe_kind, p.p_lo, p.p_hi, p.s_lo, p.s_hi,
               CAST((SELECT COUNT(*) FROM zzones) AS BIGINT) AS n_rgs_total,
               CAST((SELECT COUNT(*) FROM zzones z
                     WHERE z.pk_mn <= p.p_hi AND z.pk_mx >= p.p_lo
                       AND z.sk_mn <= p.s_hi AND z.sk_mx >= p.s_lo)
                   AS BIGINT) AS n_rgs_read,
               CAST(COALESCE((SELECT SUM(z.rws) FROM zzones z
                     WHERE z.pk_mn <= p.p_hi AND z.pk_mx >= p.p_lo
                       AND z.sk_mn <= p.s_hi AND z.sk_mx >= p.s_lo), 0)
                   AS BIGINT) AS n_rows_scanned,
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE l.l_partkey BETWEEN p.p_lo AND p.p_hi
                       AND l.l_suppkey BETWEEN p.s_lo AND p.s_hi)
                   AS BIGINT) AS n_rows_found,
               CAST((SELECT COUNT(*) FROM lzones) AS BIGINT) AS lin_rgs_total,
               CAST((SELECT COUNT(*) FROM lzones z
                     WHERE z.pk_mn <= p.p_hi AND z.pk_mx >= p.p_lo
                       AND z.sk_mn <= p.s_hi AND z.sk_mx >= p.s_lo)
                   AS BIGINT) AS lin_rgs_read,
               CAST(COALESCE((SELECT SUM(z.rws) FROM lzones z
                     WHERE z.pk_mn <= p.p_hi AND z.pk_mx >= p.p_lo
                       AND z.sk_mn <= p.s_hi AND z.sk_mx >= p.s_lo), 0)
                   AS BIGINT) AS lin_rows_scanned
        FROM probes p
    """


@register(
    "q_layout_rowgroup_zorder",
    oracle=_rowgroup_zorder_oracle(),
    doc=(
        "MULTI-COLUMN row-group skipping (r11 — the Z-order wave at "
        "row-group granularity, the residual wave-75 named): lineitem "
        "bucketizes l_partkey and l_suppkey range-preservingly "
        "(k*16 div (max+1) — monotone, so raw-range predicates map to "
        "bucket ranges), Morton-interleaves into zval (the wave-14 "
        "curve), and is written as 16 hive-dir files (one 4x4 bucket "
        "block each) with explicit 256-row row groups over the "
        "(zval, l_orderkey, l_linenumber) total order. Per-row-group "
        "TWO-COLUMN zone map (min/max of both keys, footer-equality "
        "tested); primary-only / secondary-only / 2-D box probes "
        "resolved as percent fractions of each key's max prune by "
        "zone overlap on both dimensions, then ONE distributed "
        "read_row_groups pass executes the pruned scan; "
        "n_rows_scanned counted from the EXECUTED read, recomputed by "
        "the oracle from its manifest replay. lin_* columns replay "
        "the SINGLE-column counterfactual (px-range-partitioned, "
        "partkey-sorted, same row-group size — manifest math, no "
        "second write): secondary-only probes scan ~everything there "
        "while Z-order reads the sx-bucket slice; primary-only probes "
        "read tighter on linear — the Z-order trade, measured at "
        "row-group granularity. Exact zones pin every n_rows_found "
        "to the full-table box count."
    ),
    tags=("layout", "scan", "scale", "pandas-udf"),
)
def q_layout_rowgroup_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_rowgroup_zorder(spark, sf_dir)
