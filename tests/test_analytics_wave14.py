"""Wave-14 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

import math

from pyspark.sql import functions as F

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_srm_uniform_assignment_not_flagged(spark):
    """The seeded md5 split is genuinely uniform, so the chi-square
    stays far under the alarm threshold on honest data."""
    rows = all_specs()["q_stats_srm"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.df == 9
    assert r.n_users > 0
    assert r.chi2 >= 0.0
    assert not r.srm_detected  # uniform hashing must not alarm


def test_srm_detects_a_rigged_split(spark):
    """Drive the REAL plan (round-3 advice): a deliberately skewed
    user_id distribution through srm_plan with a parametrized bucket
    expression must fire the positive detection path of the actual
    Spark expression, not a Python re-derivation."""
    from pyspark.sql import functions as F

    from weather_flink_spark.plans.analytics_wave14 import srm_plan

    # 300 users in bucket 0, ~78 in each of 1..9 (n=1000)
    ids = [k * 10 for k in range(300)]
    for b in range(1, 10):
        ids += [k * 10 + b for k in range(78 if b > 2 else 78 + 11)]
    e = spark.createDataFrame([(i,) for i in ids], "user_id bigint")
    rows = srm_plan(e, bucket=F.col("user_id") % 10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_users == len(ids)
    assert r.df == 9
    assert r.srm_detected  # 30% in one bucket must alarm
    assert r.chi2 > 27.877


def test_srm_empty_bucket_contributes_expected_term(spark):
    """A bucket with ZERO users — the most extreme mismatch — must
    contribute its full (B*0-n)^2/(B*n) = n/B term (round-3 advice:
    the old statistic silently dropped unobserved buckets)."""
    from pyspark.sql import functions as F

    from weather_flink_spark.plans.analytics_wave14 import srm_plan

    # 200 users spread over buckets 0..4 only; buckets 5..9 empty
    ids = [k * 10 + b for b in range(5) for k in range(40)]
    e = spark.createDataFrame([(i,) for i in ids], "user_id bigint")
    r = srm_plan(e, bucket=F.col("user_id") % 10).collect()[0]
    n = len(ids)
    expected = (5 * (10 * 40 - n) ** 2 + 5 * n * n) / (10 * n)
    assert abs(r.chi2 - round(expected, 6)) < 1e-9
    assert r.srm_detected


def test_acf_bounds_and_lag1_dominance(spark):
    rows = {r.lag_h: r for r in all_specs()["q_events_acf"].fn(spark, SF).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert -1.0 <= r.acf <= 1.0
        assert r.n > 10


def test_m4_envelope_and_endpoints(spark):
    rows = all_specs()["q_events_m4_downsample"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.v_min <= r.v_max
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        assert r.n_obs >= 1


def test_zorder_files_have_narrow_spans_on_both_dims(spark):
    """The point of Z-clustering: every file covers a narrow rectangle
    in (px, sx) bucket space, so min/max skipping prunes on EITHER
    dimension. A lexicographic (px, sx) sort would give sx spans of 15
    for every multi-px file."""
    from weather_flink_spark.io import load

    rows = all_specs()["q_layout_zorder"].fn(spark, SF).collect()
    assert 1 < len(rows) <= 16
    # every lineitem row lands in exactly one file
    assert sum(r.n_rows for r in rows) == load(spark, SF, "lineitem").count()
    for r in rows:
        # 16 z-cells per file = a 4x4 Morton block: span <= 3 per dim
        assert r.px_max - r.px_min <= 3
        assert r.sx_max - r.sx_min <= 3


@pytest.mark.slow
def test_adamic_adar_weights_favor_small_baskets(spark):
    df = all_specs()["q_graph_adamic_adar"].fn(spark, SF)
    rows = df.collect()
    assert rows
    for r in rows[:200]:
        assert r.n_co >= 2
        assert r.p1 < r.p2
        # each co-order contributes at most 1/ln(3) and more co-orders
        # can only raise the score
        assert 0 < r.aa_score <= r.n_co / math.log(3) + 1e-9


def test_weighted_sample_prefers_heavy_docs(spark):
    """E-S sampling with weight = n_chars must skew the sample's mean
    length above the corpus mean, and keys must be valid (<= 0)."""
    from weather_flink_spark.io import load

    sample = all_specs()["q_sample_weighted"].fn(spark, SF).collect()
    assert len(sample) == 100
    assert all(r.key9 <= 0 for r in sample)
    corpus_avg = (
        load(spark, SF, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_avg = sum(r.n_chars for r in sample) / len(sample)
    assert sample_avg > corpus_avg


def test_profile_matches_direct_aggregates(spark):
    from weather_flink_spark.io import load

    prof = {r.col_name: r for r in all_specs()["q_profile_columns"].fn(spark, SF).collect()}
    li = load(spark, SF, "lineitem")
    n = li.count()
    direct = li.agg(
        F.countDistinct("l_partkey").alias("nd"),
        F.min("l_quantity").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    ).collect()[0]
    assert prof["l_partkey"].n_rows == n
    assert prof["l_partkey"].n_nulls == 0
    assert prof["l_partkey"].n_distinct == direct.nd
    assert prof["l_quantity"].min_v == direct.mn
    assert prof["l_extendedprice"].max_v == direct.mx


@pytest.mark.slow
def test_kl_divergence_nonnegative_and_self_consistent(spark):
    """KL >= 0 up to the 9dp term quantization; a source that IS most
    of the corpus should diverge less than a tiny skewed one... at
    minimum every value is finite and near-nonnegative."""
    rows = all_specs()["q_text_kl_source_divergence"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.kl > -1e-6  # smoothing + quantization slack
        assert r.n_tokens > 0
        assert r.vocab > 0
    # all sources share one corpus vocab
    assert len({r.vocab for r in rows}) == 1


def test_survival_hazard_monotonics(spark):
    rows = sorted(
        all_specs()["q_stats_survival_hazard"].fn(spark, SF).collect(),
        key=lambda r: r.duration_days,
    )
    assert rows
    # risk set shrinks as duration grows; cumulative hazard never falls
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk > b.n_risk
        assert a.cum_hazard <= b.cum_hazard
    total = rows[0].n_risk  # everyone is at risk at the earliest time
    assert sum(r.n_death + r.n_censored for r in rows) == total
    for r in rows:
        assert 0.0 <= r.hazard <= 1.0


def test_kl_divergence_single_tokenize_pass(spark):
    """Round-3 verdict #2: the four consumers (corpus totals, per-source
    totals, scalars, grid join) must ride ONE exploded-token aggregation
    — the executed plan carries exactly one documents scan, with every
    other branch a ReusedExchange of the shared src_tok shuffle."""
    df = all_specs()["q_text_kl_source_divergence"].fn(spark, SF)
    df.collect()  # AQE finalizes exchange reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert final.count("ReusedExchange") >= 2, final


def test_zorder_layout_prunes_rowgroups_on_boxed_read(spark):
    """Round-3 verdict #5: write the z-clustered layout to parquet and
    PROVE the skipping it buys — under a 2-D box predicate, the file/
    row-group min-max footer stats (exactly what parquet row-group
    pruning consults) admit only the Morton block touching the box,
    while the unsorted twin's files all overlap it. Also asserts Spark
    pushes the box predicates to the scan, so the stats are consulted
    at read time."""
    import glob
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as papq
    from pyspark.sql import functions as F

    from weather_flink_spark.io import load
    from weather_flink_spark.plans.analytics_wave14 import _Z_SPARK

    li = load(spark, SF, "lineitem").select("l_partkey", "l_suppkey")
    z = li.select(
        (F.col("l_partkey") % 16).alias("px"),
        (F.col("l_suppkey") % 16).alias("sx"),
        F.expr(_Z_SPARK).alias("zval"),
    )
    base = os.path.join(tempfile.gettempdir(), "wfs_zorder_probe")
    zdir, udir = os.path.join(base, "zorder"), os.path.join(base, "plain")
    shutil.rmtree(base, ignore_errors=True)
    z.repartitionByRange(16, "zval").write.mode("overwrite").parquet(zdir)
    z.repartition(16).write.mode("overwrite").parquet(udir)

    def overlapping_row_groups(d):
        hit = total = 0
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = papq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ipx, isx = names.index("px"), names.index("sx")
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                spx = g.column(ipx).statistics
                ssx = g.column(isx).statistics
                total += 1
                if spx.min <= 3 and spx.max >= 0 and ssx.min <= 3 and ssx.max >= 0:
                    hit += 1
        return hit, total

    z_hit, z_total = overlapping_row_groups(zdir)
    u_hit, u_total = overlapping_row_groups(udir)
    # z-layout: only the Morton block(s) around the box survive the
    # stats check; unsorted: every row group spans the whole grid
    assert z_total >= 8 and z_hit <= max(2, z_total // 4), (z_hit, z_total)
    assert u_hit == u_total, (u_hit, u_total)

    # the box predicates reach the parquet scan (PushedFilters), so the
    # footer stats above are exactly what the reader consults
    back = spark.read.parquet(zdir).filter(
        (F.col("px") <= 3) & (F.col("sx") <= 3)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "px" in pushed and "sx" in pushed, plan[:900]
    # identical answers from both layouts
    assert back.count() == spark.read.parquet(udir).filter(
        (F.col("px") <= 3) & (F.col("sx") <= 3)
    ).count()
    shutil.rmtree(base, ignore_errors=True)
