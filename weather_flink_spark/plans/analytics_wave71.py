"""Wave-71 operator (round 10): bloom-filter file skipping on an
EXECUTED scan (r9 verdict task #4).

``q_layout_bloom_index`` (wave-17) designs the per-file bloom — built
relationally over SIMULATED files (l_orderkey % 16) with an estimated
fpp — but the index never touched a real scan, while the Z-order
entries (wave-42/51) prove real footer-level pruning. This entry
closes that gap: the same 252-bit / 2-hash seeded-md5 bloom becomes an
actual data-skipping index over actual parquet files, and the probe
side executes a point lookup that READS ONLY THE SURVIVING FILES.

``q_layout_bloom_skipping``:

1. WRITE: lineitem is laid out as 16 real parquet files (one per
   ``file_id = l_orderkey % 16`` directory — the wave-42 one-file-per
   -dir discipline);
2. INDEX: per-file blooms are built relationally FROM THE WRITTEN
   FILES (BIT_OR'd 63-bit-packed words per file — the wave-17 build
   over the read-back table, now NDV-SIZED: 16 bits per distinct key
   at the largest file, k=2 hashes -> fpp ~1.4%; the wave-17 fixed
   252-bit design saturates past ~60 keys/file, which is exactly why
   the design entry's est_fpp reads ~1.0 at sf>=0.001 — a real writer
   sizes by NDV) and collected as the manifest sidecar (bounded:
   |files| x words rows — index size scales with NDV, not row count);
3. SKIP: each probe key hashes to 2 bit positions (same seeded-md5
   rule); a file is read iff BOTH bits are set in its sidecar words —
   the pruned path list is decided BEFORE any read;
4. SCAN: each probe's lookup runs only over its surviving files
   (a probe with zero surviving files never touches storage at all),
   and the per-probe row reports (n_files_total, n_files_read,
   n_rows_found).

Because blooms have no false negatives, the pruned scan's row count
must equal the full-table count for the key — the oracle computes that
count from the raw table and replays the bloom membership per file, so
the hash compare gates the END-TO-END skipping correctness, not just
the index bytes. The 3 probes that exist nowhere measure the real
false-positive rate as files-read-for-nothing (n_files_read > 0 with
n_rows_found = 0); tests/test_analytics_wave71.py proves from executed
scans (``input_file_name()``) that lookups touch a strict subset of
the 16 files.

Scale: the write is one row-scale shuffle; the bloom build shuffles 4
words per file (never keys); the sidecar collect is |files| x 4 rows
(a lakehouse stores it in the manifest/footer — the driver here plays
the manifest's role); each probe's scan is |surviving files| only —
exactly the point-lookup shape bloom skipping buys at 100 TB, where
min/max zones are useless on high-cardinality keys.

Reference parity note: the reference manages no storage layout (empty
plan body, ``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave17 import (
    _BH1,
    _BH1_D,
    _BH2,
    _BH2_D,
    _BLOOM_BITS,
    _BLOOM_FILES,
    _BLOOM_PROBES,
)
from weather_flink_spark.plans.registry import register
from weather_flink_spark.operators.snapshot import snapshot


def bloomskip_dir(sf_dir: str) -> str:
    """Deterministic collision-free layout dir for this process + sf
    (the wave-42 md5-suffix discipline)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"wfs_bloomskip_{os.getpid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def write_bloom_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem as one parquet file per ``file_id`` directory and
    return the layout dir. ``repartition(n, key)`` puts each key in
    exactly one task, so partitionBy emits exactly one file per dir."""
    d = bloomskip_dir(sf_dir)
    if os.path.exists(d):
        shutil.rmtree(d)
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % _BLOOM_FILES).alias("file_id"),
        "l_orderkey",
        "l_partkey",
        "l_quantity",
    )
    li.repartition(_BLOOM_FILES, "file_id").write.partitionBy("file_id").parquet(d)
    return d


BLOOM_BITS_PER_KEY = 16  # k=2 hashes -> fpp ~ (1 - e^(-1/8))^2 ~ 1.4%


def distinct_file_keys(spark: SparkSession, layout_dir: str) -> DataFrame:
    """The (file_id, k) distinct-key table read back FROM THE WRITTEN
    FILES — the one data-sized pass both the sizing rule and the
    sidecar build need. Snapshotted so the two consumers share a
    single distinct instead of each re-scanning the layout (r11)."""
    back = spark.read.parquet(layout_dir)
    return (
        back.select("file_id", F.col("l_partkey").alias("k"))
        .distinct()
        .transform(snapshot(eager=False))
    )


def sized_bloom_bits(
    spark: SparkSession, layout_dir: str, keys: DataFrame | None = None
) -> int:
    """NDV-sized bloom width, the rule a real writer applies per file:
    16 bits per distinct key at the LARGEST file, rounded up to whole
    63-bit words (min 4 words — the wave-17 fixed design as the
    floor). Integer-exact, so the oracle replays it from the same
    counts. Bounded collect: 1 value (the writer's sizing decision)."""
    if keys is None:
        keys = distinct_file_keys(spark, layout_dir)
    ndv_max = (
        keys.groupBy("file_id")
        .agg(F.count("*").alias("ndv"))
        .agg(F.max("ndv").alias("m"))
        .collect()[0]["m"]
    )
    n_words = max(
        _BLOOM_BITS // 63, (BLOOM_BITS_PER_KEY * int(ndv_max) + 62) // 63
    )
    return 63 * n_words


def build_bloom_sidecar(
    spark: SparkSession,
    layout_dir: str,
    bits: int,
    keys: DataFrame | None = None,
) -> dict[int, list[int]]:
    """Per-file bloom words FROM THE WRITTEN FILES: file_id ->
    [w0..w_{bits/63-1}]. Bounded collect: |files| x (bits/63) rows —
    the manifest/footer artifact of a lakehouse bloom index (index
    size scales with NDV, never with row count)."""
    n_words = bits // 63
    if keys is None:
        keys = distinct_file_keys(spark, layout_dir)
    h1 = F.expr(_BH1.format(k="k", bits=bits))
    h2 = F.expr(_BH2.format(k="k", bits=bits))
    words = (
        keys.select("file_id", F.explode(F.array(h1, h2)).alias("pos"))
        .groupBy("file_id", F.expr("pos div 63").alias("widx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int)))"
            ).alias("w")
        )
    )
    sidecar: dict[int, list[int]] = {}
    for r in words.collect():
        sidecar.setdefault(int(r.file_id), [0] * n_words)[int(r.widx)] = int(r.w)
    return sidecar


def probe_positions(spark: SparkSession, bits: int) -> dict[int, list[int]]:
    """probe key -> its 2 bloom bit positions, evaluated with the SAME
    Spark hash expressions the index build uses (bounded: |probes|
    rows)."""
    probes = spark.createDataFrame([(p,) for p in _BLOOM_PROBES], "p bigint")
    ph1 = F.expr(_BH1.format(k="p", bits=bits))
    ph2 = F.expr(_BH2.format(k="p", bits=bits))
    return {
        int(r.p): [int(r.pos1), int(r.pos2)]
        for r in probes.select("p", ph1.alias("pos1"), ph2.alias("pos2")).collect()
    }


def surviving_files(
    sidecar: dict[int, list[int]], positions: list[int]
) -> list[int]:
    """The skip decision: a file must be read iff EVERY probe bit is
    set in its sidecar words (bloom 'maybe'); pure index arithmetic,
    zero storage reads."""
    out = []
    for fid in sorted(sidecar):
        w = sidecar[fid]
        if all((w[pos // 63] >> (pos % 63)) & 1 for pos in positions):
            out.append(fid)
    return out


def run_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the layout, build the sidecar, and execute every probe's
    point lookup over ONLY the surviving files; one row per probe.

    r11: ONE distributed read over the UNION of the probes' surviving
    files serves every probe (the wave-75 row-group discipline brought
    back to file granularity) instead of a per-probe scan subtree
    unioned 5 ways. Correctness is unchanged by construction: blooms
    have no false negatives, so every row of probe p lives in p's own
    surviving set — counting p's rows over the union can see no extra
    rows — and a probe surviving nowhere contributes no path and
    left-joins to 0 without touching storage. The union is still a
    bloom-pruned strict subset of the layout whenever any file is
    skipped (the executed-scan subset proof in tests reads per-probe
    paths through the same helpers).

    Reporting note (r11 advice): ``n_files_read`` is the LOGICAL
    per-probe prune count (what a stand-alone lookup for that probe
    would read), not the file count of the single executed union scan
    — the entry measures one union scan, less I/O than the per-probe
    lookups it models, so pre-r11 A/B comparisons of this entry's
    seconds are not pure engine wins."""
    layout = write_bloom_layout(spark, sf_dir)
    keys = distinct_file_keys(spark, layout)
    bits = sized_bloom_bits(spark, layout, keys)
    sidecar = build_bloom_sidecar(spark, layout, bits, keys)
    pos = probe_positions(spark, bits)
    keep = {p: surviving_files(sidecar, pos[p]) for p in _BLOOM_PROBES}
    probe_rows = spark.createDataFrame(
        [(p, len(sidecar), len(keep[p])) for p in _BLOOM_PROBES],
        "probe_key bigint, n_files_total bigint, n_files_read bigint",
    )
    union_fids = sorted({fid for fids in keep.values() for fid in fids})
    if not union_fids:
        # every bloom said NO everywhere: no lookup touches storage
        return probe_rows.select(
            "*", F.lit(0).cast("bigint").alias("n_rows_found")
        )
    paths = [os.path.join(layout, f"file_id={fid}") for fid in union_fids]
    counts = (
        spark.read.parquet(*paths)
        .filter(F.col("l_partkey").isin([int(p) for p in _BLOOM_PROBES]))
        .groupBy(F.col("l_partkey").alias("probe_key"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    return probe_rows.join(F.broadcast(counts), "probe_key", "left").select(
        "probe_key",
        "n_files_total",
        "n_files_read",
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_rows_found"),
    )


_PROBE_LIST = ", ".join(str(p) for p in _BLOOM_PROBES)


@register(
    "q_layout_bloom_skipping",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT l_orderkey % {_BLOOM_FILES} AS file_id,
                            l_partkey AS k
            FROM lineitem
        ),
        bsz AS (
            SELECT 63 * GREATEST({_BLOOM_BITS // 63},
                       ({BLOOM_BITS_PER_KEY} * MAX(ndv) + 62) // 63) AS bits
            FROM (
                SELECT COUNT(*) AS ndv FROM keys GROUP BY file_id
            )
        ),
        bits AS (
            SELECT file_id, UNNEST([
                {_BH1_D.format(k="k", bits="(SELECT bits FROM bsz)")},
                {_BH2_D.format(k="k", bits="(SELECT bits FROM bsz)")}]) AS pos
            FROM keys
        ),
        words AS (
            SELECT file_id, pos // 63 AS widx,
                   BIT_OR(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS w
            FROM bits GROUP BY 1, 2
        ),
        files AS (SELECT DISTINCT file_id FROM keys),
        probe_bits AS (
            SELECT p, pos // 63 AS widx,
                   1::BIGINT << CAST(pos % 63 AS INTEGER) AS mask
            FROM (
                SELECT p, UNNEST([
                    {_BH1_D.format(k="p", bits="(SELECT bits FROM bsz)")},
                    {_BH2_D.format(k="p", bits="(SELECT bits FROM bsz)")}]) AS pos
                FROM (SELECT UNNEST([{_PROBE_LIST}]) AS p)
            )
        ),
        member AS (
            SELECT f.file_id, pb.p,
                   BOOL_AND(w.w IS NOT NULL
                            AND (w.w & pb.mask) = pb.mask) AS member
            FROM files f
            CROSS JOIN probe_bits pb
            LEFT JOIN words w
              ON w.file_id = f.file_id AND w.widx = pb.widx
            GROUP BY f.file_id, pb.p
        ),
        counts AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        )
        SELECT m.p AS probe_key,
               CAST((SELECT COUNT(*) FROM files) AS BIGINT) AS n_files_total,
               CAST(SUM(CASE WHEN m.member THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_files_read,
               CAST(COALESCE(MAX(c.c), 0) AS BIGINT) AS n_rows_found
        FROM member m
        LEFT JOIN counts c ON c.k = m.p
        GROUP BY m.p
    """,
    doc=(
        "Bloom-filter file skipping on an EXECUTED scan (r10, r9 "
        "verdict task #4 — the wave-17 design entry's index finally "
        "touches storage): lineitem written as 16 real one-file-per-"
        "dir parquet files, per-file NDV-SIZED seeded-md5 blooms (16 "
        "bits per distinct key at the largest file, k=2 hashes, whole "
        "63-bit words — both engines replay the integer sizing rule) "
        "built relationally FROM THE WRITTEN FILES and collected as "
        "the manifest sidecar, then every probe's point "
        "lookup reads ONLY files whose bloom answers 'maybe' — a probe "
        "surviving nowhere never touches storage. Per probe: files "
        "total/read and rows found from the pruned executed scan; no "
        "false negatives means the pruned count must equal the full-"
        "table count, which the oracle computes from the raw table "
        "alongside a full relational bloom replay — the hash compare "
        "gates end-to-end skipping correctness. The 3 nowhere-keys "
        "read files for nothing iff bloom false-positives fire "
        "(the REAL fpp, measured not estimated); executed-scan "
        "strict-subset proof in tests via input_file_name()."
    ),
    tags=("layout", "scan", "sink", "scale"),
)
def q_layout_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_bloom_skipping(spark, sf_dir)
