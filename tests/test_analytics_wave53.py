"""Wave-53: BFS python twin, bucketed-join zero-shuffle plan proof,
streaming CDC upsert equality + idempotency."""

from __future__ import annotations

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from weather_flink_spark.plans import analytics_wave53 as w53
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_bfs_levels_match_python_bfs(spark):
    got = {r.node: r.level for r in all_specs()["q_graph_bfs_levels"].fn(spark, SF).collect()}

    t = pq.read_table(SF + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges: dict[str, set[str]] = {}
    for o, p in set(zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist())):
        po, oo = f"p:{p}", f"o:{o}"
        edges.setdefault(po, set()).add(oo)
        edges.setdefault(oo, set()).add(po)
    level = {
        f"p:{p}": 0
        for p in set(t["l_partkey"].to_pylist())
        if p <= w53._BFS_SEED_PARTS
    }
    frontier = set(level)
    for k in range(1, w53._BFS_ROUNDS + 1):
        nxt = set()
        for n in frontier:
            for m in edges.get(n, ()):
                if m not in level:
                    level[m] = k
                    nxt.add(m)
        frontier = nxt
    assert got == level
    assert 0 in got.values() and max(got.values()) >= 2  # real expansion


def test_bucketed_colocated_join_plan_has_no_join_shuffle(spark):
    df = all_specs()["q_join_bucketed_colocated"].fn(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan
    assert f"SelectedBucketsCount: {w53.N_BUCKETS} out of {w53.N_BUCKETS}" in plan
    # no exchange on the join key — buckets feed the SMJ directly; the
    # only exchange allowed is the post-agg one on o_orderpriority
    assert "hashpartitioning(l_orderkey" not in plan, plan[:1200]


def test_cdc_stream_final_state_equals_batch_twin_and_replay_is_noop(spark):
    final, handles = w53.run_cdc_upsert_stream(spark, SF)
    got = {
        r.user_id: (r.t_us, r.event_type, r.value) for r in final.collect()
    }

    # batch twin: latest event per user over the same fixture rows
    t = pq.read_table(
        SF + "/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    ).to_pandas()
    t = t[t.user_id.isin(handles["fixture_users"])]
    t = t.sort_values(["ts", "event_id"]).head(handles["n_rows"])
    t["t_us"] = t.ts.map(lambda x: x.value // 1000)  # ns -> µs, the fixture rule
    want = {}
    for r in t.sort_values(["t_us", "event_id"]).itertuples():
        want[int(r.user_id)] = (int(r.t_us), str(r.event_type), float(r.value))
    assert got == want

    # idempotent replay: re-applying batch 0 (already in the log)
    # leaves the snapshot byte-identical
    before = sorted(
        (r.user_id, r.t_us, r.event_type, r.value)
        for r in spark.read.parquet(handles["snap_dir"]).collect()
    )
    fake_batch = spark.createDataFrame(
        [(999, 1, 9_999_999_999_999, "purchase", 1.0)],
        "user_id long, event_id long, t_us long, event_type string, value double",
    )
    handles["merge_batch"](fake_batch, 0)  # batch_id 0 already applied
    after = sorted(
        (r.user_id, r.t_us, r.event_type, r.value)
        for r in spark.read.parquet(handles["snap_dir"]).collect()
    )
    assert after == before
    assert 999 not in {r[0] for r in after}
