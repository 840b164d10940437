"""Wave-62 operator (round 9): next-fit sequence packing into
fixed-token context windows — the packing step of an LLM training-data
pipeline (GPT-style document packing; Raffel et al. 2020 "combine and
chunk"), composing the engine's existing shard contract.

``q_pack_nextfit_bins``: documents take their wave-16 training shard
(seeded-md5 'shard:' hash, 8 shards) and intra-shard shuffle position
(seeded-md5 'order:' — the SAME reproducible order
q_pack_shuffle_shards emits), then pack NEXT-FIT into CAP=256-token
context windows: walk the shard in shuffle order, keep appending while
fill + tokens <= CAP, else open a new bin (an oversize document opens
its own bin with fill > CAP — recorded honestly as fill_pct > 1, the
don't-split-documents packing variant). Output one row per (shard,
bin): n_docs, bin_tokens, fill_pct — the packing-efficiency surface a
training run monitors (waste = 1 - fill).

Token rule: whitespace tokens (len(string_split(text, ' ')) — the
q_text_token_count surface), exact integers on both engines.

Scale (the wave-46 collapse shape): the shard is the unit of
sequential work BY CONSTRUCTION — packing is order-dependent within a
shard and embarrassingly parallel across shards, exactly how a
production packer runs (one worker per shard). Spark collapses each
shard to ONE row (sort_array(collect_list(struct(pos, doc, tok)))),
runs the next-fit walk inside mapInPandas over hash partitions (a
fixed number of Python crossings, independent of document count), and
explodes per-bin rows back out. At 100 TB shard count scales with the
cluster, not with this plan's shape.

Oracle: DuckDB replays the walk as a recursive CTE stepping one
document per iteration per shard (all shards advance in parallel in
the recursion), then aggregates bins — fill is strictly increasing
within a bin, so bin_tokens = MAX(fill).

Reference parity note: the reference's transformation plan is empty
(``WeatherProcessingJobPlan.java:9-11``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.analytics_wave16 import (
    _ORDER_DUCK,
    _ORDER_SPARK,
    _SHARD_DUCK,
    _SHARD_SPARK,
)
from weather_flink_spark.plans.registry import register

PACK_CAP = 256  # context-window token budget per bin


def _nextfit_oracle() -> str:
    return f"""
        WITH RECURSIVE d AS (
            SELECT doc_id,
                   {_SHARD_DUCK} AS shard_id,
                   {_ORDER_DUCK} AS ok,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
            FROM documents
        ),
        seq AS (
            SELECT doc_id, shard_id, tok,
                   ROW_NUMBER() OVER (
                       PARTITION BY shard_id ORDER BY ok, doc_id) AS pos
            FROM d
        ),
        walk AS (
            SELECT shard_id, pos, CAST(1 AS BIGINT) AS bin_id, tok AS fill
            FROM seq WHERE pos = 1
            UNION ALL
            SELECT s.shard_id, s.pos,
                   CASE WHEN w.fill + s.tok > {PACK_CAP}
                        THEN w.bin_id + 1 ELSE w.bin_id END,
                   CASE WHEN w.fill + s.tok > {PACK_CAP}
                        THEN s.tok ELSE w.fill + s.tok END
            FROM walk w
            JOIN seq s ON s.shard_id = w.shard_id AND s.pos = w.pos + 1
        )
        SELECT shard_id, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(fill) AS BIGINT) AS bin_tokens,
               CAST(MAX(fill) AS DOUBLE) / {PACK_CAP} AS fill_pct
        FROM walk
        GROUP BY shard_id, bin_id
    """


@register(
    "q_pack_nextfit_bins",
    oracle=_nextfit_oracle(),
    doc=(
        "Next-fit packing of documents into 256-token context windows "
        "per training shard (r9): walks each wave-16 shard in its "
        "seeded shuffle order, appending while fill + tokens <= CAP, "
        "else opening a new bin (oversize docs own a bin, fill_pct > 1 "
        "recorded honestly) — one row per (shard, bin) with docs, "
        "tokens and fill. The shard is the sequential unit BY "
        "CONSTRUCTION (packing is order-dependent in-shard, parallel "
        "across shards — how production packers run); Spark collapses "
        "each shard to one sorted-struct row and walks it in "
        "mapInPandas over hash partitions (fixed Python crossings, "
        "the wave-46 rule). Oracle replays the walk as a recursive "
        "CTE, one doc per iteration per shard."
    ),
    tags=("llm-pipeline", "packing", "pandas-udf"),
)
def q_pack_nextfit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_SHARD_SPARK).alias("shard_id"),
        F.expr(_ORDER_SPARK).alias("ok"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("tok"),
    )
    ser = d.groupBy("shard_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ok", "doc_id", "tok"))
        ).alias("seq")
    )

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = []
            for shard_id, seq in zip(pdf["shard_id"], pdf["seq"]):
                bin_id, fill, n_docs = 0, 0, 0
                bins = []
                for row in seq:
                    tok = int(row["tok"])
                    if bin_id == 0 or fill + tok > PACK_CAP:
                        if bin_id > 0:
                            bins.append((bin_id, n_docs, fill))
                        bin_id += 1
                        fill, n_docs = tok, 1
                    else:
                        fill += tok
                        n_docs += 1
                if bin_id > 0:
                    bins.append((bin_id, n_docs, fill))
                for b, n, f in bins:
                    out.append(
                        (int(shard_id), b, n, f, float(f) / PACK_CAP)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "shard_id",
                    "bin_id",
                    "n_docs",
                    "bin_tokens",
                    "fill_pct",
                ],
            )

    return ser.repartition(32, "shard_id").mapInPandas(
        kernel,
        schema=(
            "shard_id bigint, bin_id bigint, n_docs bigint,"
            " bin_tokens bigint, fill_pct double"
        ),
    )
