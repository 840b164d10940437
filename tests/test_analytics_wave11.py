"""Wave-11 semantics beyond the oracle hash."""

from __future__ import annotations
import pytest

import datetime
import os
import tempfile

from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def _events_fixture(spark, values_by_user):
    """Write a minimal events.parquet with one row per (user, value)."""
    rows = []
    eid = 0
    for uid, values in values_by_user.items():
        t = datetime.datetime(2024, 1, 1)
        for v in values:
            rows.append((eid, t, uid, "click", float(v), "{}"))
            t += datetime.timedelta(minutes=1)
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = os.path.join(tempfile.gettempdir(), "wfs_wave11_fixture")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.slow
def test_alert_debounce_state_machine(spark):
    """Pin the hysteresis semantics on crafted sequences (H=breach 100,
    L=recovery 0; threshold 40, K=3):
    - user 1: HH L HHH -> short run suppressed, onset at the 3rd H of
      the qualifying run
    - user 2: HHHH L HHH -> second breach run is NOT a new onset (state
      never cleared: only one L between, needs K consecutive)
    - user 3: HHH LLL HHH -> two onsets (full recovery in between)
    - user 4: HH LL HH -> no onset at all (never 3 consecutive)
    """
    from weather_flink_spark.plans.analytics_wave11 import q_events_alert_debounce

    H, L = 100.0, 0.0
    d = _events_fixture(
        spark,
        {
            1: [H, H, L, H, H, H],
            2: [H, H, H, H, L, H, H, H],
            3: [H, H, H, L, L, L, H, H, H],
            4: [H, H, L, L, H, H],
        },
    )
    rows = sorted(
        q_events_alert_debounce(spark, d).collect(),
        key=lambda r: (r.user_id, r.onset_ts),
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert sorted(by_user) == [1, 2, 3]
    assert len(by_user[1]) == 1
    # onset at minute offset 5 (0-indexed events at minutes 0..5)
    assert by_user[1][0].onset_ts.minute == 5
    assert len(by_user[2]) == 1  # single L does not clear -> no re-onset
    assert by_user[2][0].onset_ts.minute == 2
    assert len(by_user[3]) == 2  # full K-recovery in between -> two onsets
    assert [r.onset_ts.minute for r in by_user[3]] == [2, 8]


def test_backlog_aging_partitions_open_orders(spark):
    from weather_flink_spark.io import load

    rows = all_specs()["q_orders_backlog_aging"].fn(spark, SF).collect()
    assert rows
    o = load(spark, SF, "orders")
    n_open = o.where("o_orderstatus <> 'F'").count()
    assert sum(r.n_orders for r in rows) == n_open
    assert {r.o_orderstatus for r in rows} <= {"O", "P"}
    assert all(r.backlog_value > 0 for r in rows)


def test_bitmap_distinct_equals_exact(spark):
    rows = all_specs()["q_agg_bitmap_distinct"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_distinct_bitmap == r.n_distinct_exact


def test_hamming_topk_invariants(spark):
    from weather_flink_spark.plans.analytics_wave12 import _HAM_K

    rows = all_specs()["q_sim_hamming_topk"].fn(spark, SF).collect()
    assert rows
    import collections

    per_q = collections.defaultdict(list)
    for r in rows:
        assert 0 <= r.hamming <= 64
        per_q[r.query_id].append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.h_rank)
        assert [r.h_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _HAM_K
        hams = [r.hamming for r in rs]
        assert hams == sorted(hams)


def test_lateral_topk_matches_window_form(spark):
    """The LATERAL form must equal the window-function top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from weather_flink_spark.io import load

    c = load(spark, SF, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    expect = {
        (r.c_mktsegment, r.c_custkey)
        for r in c.withColumn("rn", F.row_number().over(w))
        .where("rn <= 2")
        .collect()
    }
    got = {
        (r.c_mktsegment, r.c_custkey)
        for r in all_specs()["q_sql_lateral_topk"].fn(spark, SF).collect()
    }
    assert got == expect
