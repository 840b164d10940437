"""Streaming state-size observability (round-7 verdict task #7).

The s_* entries CLAIM bounded per-key state; these tests turn the claim
into a measured fact by asserting the stateOperators rows/bytes the
engine itself reports per micro-batch (via run_to_memory's
progress_sink hook):

- s_rate_limit: state is one (window, count) pair per device — rows
  must stay EXACTLY at the live-device count on every batch, never
  accumulating history.
- s_dedup_within_watermark: dedup state must EVICT with the watermark —
  total rows inserted across batches strictly exceeds the final state
  size, and numRowsRemoved fires.
- s_stream_kalman_filter: one (level, var, n) triple per user — rows
  flat across batches at the user count.

At 100 TB these are the invariants that keep a long-running stream's
state store from growing with history instead of keys.
"""

from __future__ import annotations

from weather_flink_spark.plans import analytics_wave29 as w29
from weather_flink_spark.plans import streaming_queries as sq

SF = "/root/testdata/sf0.001"


def _state_ops(progress: list) -> list[dict]:
    """One stateOperators dict per micro-batch, batch order."""
    out = []
    for p in sorted(progress, key=lambda p: p.get("batchId", 0)):
        ops = p.get("stateOperators", [])
        if ops:
            assert len(ops) == 1, ops  # all three plans have one state op
            out.append(ops[0])
    return out


def test_rate_limit_state_rows_flat_at_live_key_count(spark):
    sink: list = []
    res = sq._rate_limit_run(spark, sink)
    n_devices = res.select("deviceId").distinct().count()
    ops = _state_ops(sink)
    assert len(ops) >= 2, "fixture must span multiple micro-batches"
    rows = [op["numRowsTotal"] for op in ops]
    # one state row per live device, every batch — never history-sized
    assert all(r == n_devices for r in rows), (rows, n_devices)
    # and bytes stay in the same small band (no monotone blow-up);
    # the store's in-memory version map makes bytes jitter, so the
    # bound is a band, not equality
    bs = [op["memoryUsedBytes"] for op in ops]
    assert max(bs) <= 4 * max(1, min(bs)), bs


def test_dedup_within_watermark_state_evicts(spark):
    sink: list = []
    sq._ddww_run(spark, sink).count()
    ops = _state_ops(sink)
    assert len(ops) >= 4, "fixture is a 4+ micro-batch scenario"
    inserted = sum(op["numRowsUpdated"] for op in ops)
    removed = sum(op["numRowsRemoved"] for op in ops)
    final_rows = ops[-1]["numRowsTotal"]
    # watermark eviction really fires...
    assert removed > 0, ops
    # ...and the store ends strictly smaller than everything inserted
    # (plain dropDuplicates would satisfy final == inserted)
    assert final_rows < inserted, (final_rows, inserted)
    assert final_rows == inserted - removed, ops
    # peak state is key-bounded, not history-bounded
    assert max(op["numRowsTotal"] for op in ops) <= inserted, ops


def test_kalman_stream_state_rows_flat_at_user_count(spark):
    sink: list = []
    res = w29._kalman_stream_run(spark, SF, sink)
    n_users = res.select("user_id").distinct().count()
    ops = _state_ops(sink)
    assert len(ops) >= 2, "state must carry across >= 2 micro-batches"
    rows = [op["numRowsTotal"] for op in ops]
    assert all(r == n_users for r in rows), (rows, n_users)
    bs = [op["memoryUsedBytes"] for op in ops]
    assert max(bs) <= 4 * max(1, min(bs)), bs
