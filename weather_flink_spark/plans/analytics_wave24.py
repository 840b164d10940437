"""Wave-24 operators (round 5): the streaming curation end-to-end twin.

- ``s_curation_verdicts`` — the streaming analog of
  ``q_corpus_pipeline``: a file stream of incoming documents is, per
  micro-batch inside one foreachBatch job, minhash-banded, probed
  against the static history band index, Jaccard-verified, and given a
  keep/drop verdict by the same canonical-document rule as
  ``q_dedup_keep_list`` (longest n_chars wins, doc_id tie-break — the
  incumbent history doc wins ties because its id is lower). Verdicts
  land in an idempotent per-batch verdict table: each batch writes its
  own directory atomically, so replaying a batch rewrites byte-identical
  content, and a verdict NEVER changes once written — it depends only on
  (static history, the document itself), not on later batches. That
  per-batch monotonicity is the property tests/test_analytics_wave24.py
  proves across micro-batches.

At 100 TB the history band/signature tables are the persisted index
(here the session-cached tables filtered to the history split); each
ingest batch pays only its own hashing plus a band-bucket equi-join —
never batch x corpus.

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``); this extends the north-star
surface (BASELINE.json) with the continuous-ingest shape of the batch
curation pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import register

JACCARD_THRESHOLD = 0.5  # same gate as q_dedup_incremental
_N_STREAM_DOCS = 9
_N_FILES = 3  # 3 fixture files x maxFilesPerTrigger=1 => 3 micro-batches


def _history_tables(spark: SparkSession, sf_dir: str, h: int):
    """Static history index: band table + (shingles, n_chars) for docs
    below the split — the persisted artifacts an ingest probes. Rides
    the session-cached corpus tables; the filter is a pushed predicate
    on the cached columnar batches, not a rebuild."""
    from weather_flink_spark.io import load
    from weather_flink_spark.plans.llm_pipeline import minhash_bands, shingle_table

    hist_bands = minhash_bands(spark, sf_dir).filter(F.col("doc_id") < h).select(
        F.col("doc_id").alias("hist_id"),
        F.col("band_id").alias("h_band_id"),
        F.col("band_key").alias("h_band_key"),
    )
    hist_sh = (
        shingle_table(spark, sf_dir)
        .filter(F.col("doc_id") < h)
        .select(F.col("doc_id").alias("hist_id"), F.col("shingle_h28").alias("h_sh"))
        .join(
            load(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("hist_id"), F.col("n_chars").alias("h_chars")
            ),
            "hist_id",
        )
    )
    return hist_bands, hist_sh


def curation_verdict_frame(
    batch_df: DataFrame, hist_bands: DataFrame, hist_sh: DataFrame
) -> DataFrame:
    """One ingest batch -> one verdict row per document.

    batch_df: (doc_id, text, n_chars). Pure composition of the shared
    shingle/band expressions + a band-bucket equi-join against the
    history index + the q_dedup_keep_list canonical rule. Batch-size
    work only: the history side is the pre-built (session-cached,
    filtered) index, and candidates are bucket-mates, never the corpus.
    """
    from weather_flink_spark.plans.analytics_wave20 import _minhash_bands_stream
    from weather_flink_spark.plans.llm_pipeline import shingle_hash_col, tokens_col

    sh_b = batch_df.select(
        "doc_id", "n_chars", shingle_hash_col(tokens_col()).alias("shingle_h28")
    )
    bands_b = _minhash_bands_stream(sh_b.select("doc_id", "shingle_h28"))
    cand = (
        bands_b.join(
            hist_bands,
            (F.col("band_id") == F.col("h_band_id"))
            & (F.col("band_key") == F.col("h_band_key")),
        )
        .select("doc_id", "hist_id")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("shingle_h28"), F.col("h_sh")))
    union = F.size("shingle_h28") + F.size("h_sh") - inter
    verified = (
        cand.join(sh_b, "doc_id")
        .join(hist_sh, "hist_id")
        .select(
            "doc_id",
            "n_chars",
            "hist_id",
            "h_chars",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("hist_id").asc()
    )
    best = (
        verified.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("doc_id", "hist_id", "h_chars", "jaccard")
    )
    return (
        batch_df.select("doc_id", "n_chars")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("hist_id").isNull(), F.lit("keep_novel"))
            .when(F.col("n_chars") > F.col("h_chars"), F.lit("keep_supersedes"))
            .otherwise(F.lit("drop_dup"))
            .alias("verdict"),
            F.col("hist_id").alias("best_match_id"),
            F.round(F.col("jaccard"), 6).alias("best_jaccard"),
        )
    )


def _stream_fixture(spark: SparkSession, sf_dir: str, n_files: int = _N_FILES) -> tuple[str, int]:
    """n_files jsonl files holding the newest _N_STREAM_DOCS documents
    (the ingest), plus the history split h. File names sort
    lexicographically so maxFilesPerTrigger=1 yields a deterministic
    batch order."""
    import pyarrow.parquet as papq

    t = papq.read_table(sf_dir + "/documents.parquet", columns=["doc_id", "text", "n_chars"])
    docs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    )[-_N_STREAM_DOCS:]
    h = docs[0][0]  # everything below the first streamed doc is history
    d = os.path.join(
        tempfile.gettempdir(), f"wfs_stream_curation_{os.getpid()}_{n_files}"
    )
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    per = len(docs) // n_files
    for i in range(n_files):
        chunk = docs[i * per : (i + 1) * per] if i < n_files - 1 else docs[(n_files - 1) * per :]
        # zero-padded so lexicographic file order == numeric batch order
        # even past 10 files (part-10 would otherwise sort before part-2)
        p = os.path.join(d, f"part-{i:04d}.jsonl")
        with open(p, "w") as f:
            for doc_id, text, n_chars in chunk:
                f.write(
                    json.dumps(
                        {"doc_id": int(doc_id), "text": text, "n_chars": int(n_chars)}
                    )
                    + "\n"
                )
        # FileStreamSource orders files by MODIFICATION TIME, not name;
        # same-second writes make batch composition nondeterministic
        # across runs. Stamp strictly increasing fixed mtimes so
        # file i == micro-batch i, every run.
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return d, int(h)


def run_curation_stream(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = _N_FILES,
    on_batch=None,
) -> DataFrame:
    """Run the end-to-end curation ingest: stream the fixture files,
    verdict each micro-batch against the static history index inside
    foreachBatch, and write each batch's verdicts to its own directory
    with an atomic rename (idempotent: a replay of batch b rewrites
    identical content). Returns the verdict table read back.

    ``on_batch(batch_id, verdict_dir)`` (tests only) observes the sink
    after each batch commits."""
    from weather_flink_spark.plans.streaming_queries import _configure

    _configure(spark)
    fixture, h = _stream_fixture(spark, sf_dir, n_files)
    hist_bands, hist_sh = _history_tables(spark, sf_dir, h)
    hist_bands = hist_bands.persist()
    hist_sh = hist_sh.persist()

    base = os.path.join(
        tempfile.gettempdir(), f"wfs_curation_out_{os.getpid()}_{n_files}"
    )
    verdict_dir = os.path.join(base, "verdicts")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(verdict_dir)

    def verdict_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = curation_verdict_frame(
            batch_df, hist_bands, hist_sh
        ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        tmp = os.path.join(base, f".tmp_b{batch_id}")
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = os.path.join(verdict_dir, f"batch-{batch_id}")
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)  # atomic: replay rewrites, never appends
        if on_batch is not None:
            on_batch(batch_id, verdict_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .json(fixture)
    )
    q = (
        stream.writeStream.foreachBatch(verdict_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 120
    while q.isActive and time.time() < deadline:
        q.awaitTermination(0.02)
    if q.isActive:
        # Never fall through to a partial verdict table: stop the query
        # and fail loudly rather than read an incomplete sink.
        q.stop()
        raise TimeoutError(
            "curation stream still active after 120s deadline; "
            "refusing to read a partial verdict table"
        )

    result = spark.read.parquet(os.path.join(verdict_dir, "batch-*"))
    out = result.select(
        "doc_id", "verdict", "best_match_id", "best_jaccard", "batch_id"
    ).orderBy("doc_id")
    rows = out.collect()  # materialize before the persisted inputs go away
    hist_bands.unpersist()
    hist_sh.unpersist()
    return spark.createDataFrame(rows, out.schema)


@register(
    "s_curation_verdicts",
    doc=(
        "Streaming curation end-to-end — the continuous-ingest twin of "
        "q_corpus_pipeline composed from s_dedup_incremental's candidate "
        "probe and q_dedup_keep_list's canonical rule: each micro-batch "
        "of incoming documents is minhash-banded, probed against the "
        "static history band index (band-bucket equi-join, never batch "
        "x corpus), Jaccard-verified, and written to an idempotent "
        "per-batch verdict table (atomic directory swap, so replays "
        "rewrite identical bytes). Verdicts are keep_novel / "
        "keep_supersedes (the new doc is longer than its best history "
        "match — the q_dedup_keep_list longest-wins rule) / drop_dup, "
        "and are MONOTONIC: a verdict depends only on history + the doc, "
        "so later batches never flip it (proven per-batch in tests). "
        "3 fixture files x maxFilesPerTrigger=1 force 3 micro-batches."
    ),
    tags=("streaming", "dedup", "llm-pipeline", "incremental", "sink"),
)
def s_curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_curation_stream(spark, sf_dir)
