"""Focused tests for the shared snapshot helper (r12).

Pins the three contracts the r11 verdict asked for: values unchanged in
every mode, lineage actually truncated in the default mode (that is the
whole point of the helper), and the WFS_NO_SNAPSHOT plan-capture mode
being a true no-op so PLAN_METRICS can see upstream of snapshot sites.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from weather_flink_spark.operators.snapshot import snapshot


def _frame(spark):
    return (
        spark.range(100)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )


def test_local_mode_values_and_truncation(spark):
    df = _frame(spark)
    snap = df.transform(snapshot(eager=False))
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, df.collect()))
    # after the first action the plan reads the materialized snapshot,
    # not the upstream aggregate — that truncation is the mechanism
    plan = snap._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_no_snapshot_mode_is_identity(spark, monkeypatch):
    monkeypatch.setenv("WFS_NO_SNAPSHOT", "1")
    df = _frame(spark)
    assert df.transform(snapshot()) is df
    assert df.transform(snapshot(eager=False)) is df


def test_reliable_mode_checkpoints_with_same_values(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("WFS_SNAPSHOT_MODE", "reliable")
    monkeypatch.setenv("WFS_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    df = _frame(spark)
    snap = df.transform(snapshot())
    assert sorted(map(tuple, snap.collect())) == sorted(map(tuple, df.collect()))
    # the reliable checkpoint lives on the configured filesystem
    assert any((tmp_path / "ckpt").rglob("*"))


def test_unknown_mode_rejected(monkeypatch):
    monkeypatch.setenv("WFS_SNAPSHOT_MODE", "bogus")
    with pytest.raises(ValueError):
        snapshot()


def test_reliable_mode_without_dir_raises(spark, monkeypatch):
    monkeypatch.setenv("WFS_SNAPSHOT_MODE", "reliable")
    monkeypatch.delenv("WFS_CHECKPOINT_DIR", raising=False)
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    with pytest.raises(RuntimeError):
        _frame(spark).transform(snapshot())
