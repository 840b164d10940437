"""Shared materialize-once snapshot for multiply-referenced subtrees.

The engine's dominant r11 waste was subtree re-execution: DataFrame
composition references the same intermediate from several branches and
Spark re-plans (and re-executes) the whole upstream per reference,
compounding exponentially for chained operators (q_customer_rfm planned
224 shuffle exchanges for a 3-exchange computation). The fix is to
materialize the small decision table once and let every consumer read
the computed snapshot. This module is the ONE place that mechanism
lives; every former inline ``.localCheckpoint(...)`` site routes
through it via ``df.transform(snapshot(...))``.

Fault-tolerance semantics, stated accurately (r11 verdict #3 corrected
an earlier docstring that claimed parity with ``persist()``):

- ``localCheckpoint`` TRUNCATES lineage and stores the partitions on
  the executors (MEMORY_AND_DISK). Losing an executor therefore FAILS
  the job — there is no lineage left to recompute from. ``persist()``
  keeps lineage and recomputes lost partitions, but it does NOT
  truncate the logical plan, so it would not fix the exponential
  re-planning this helper exists for.
- On local[N] there is exactly one "executor" (the driver JVM); if it
  dies the job is gone regardless, so localCheckpoint costs nothing in
  fault tolerance here and is the default.
- On a real cluster, set ``WFS_SNAPSHOT_MODE=reliable`` to switch every
  site to ``DataFrame.checkpoint`` — same lineage truncation, but the
  snapshot is written to the (fault-tolerant) checkpoint directory
  (``WFS_CHECKPOINT_DIR``, or Spark's configured checkpoint dir), so
  executor loss recovers by re-reading it. The extra cost is one
  write+read of the snapshot through that filesystem.

``eager``: lazy (default) defers materialization to the first action,
letting a query that is never executed pay nothing; eager materializes
immediately — iterative algorithms (BFS/LPA/k-core rounds) use it so
each round's plan really is cut before the next round builds on it.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame

_MODES = ("local", "reliable")


def snapshot(eager: bool = True) -> Callable[[DataFrame], DataFrame]:
    """Return a ``df.transform``-able materialize-once snapshot.

    Usage: ``df.transform(snapshot())`` (eager, like bare
    ``localCheckpoint()``) or ``df.transform(snapshot(eager=False))``.
    Values are unchanged — the subtree is deterministic; only the number
    of times it plans/executes changes.
    """
    mode = os.environ.get("WFS_SNAPSHOT_MODE", "local")
    if mode not in _MODES:
        raise ValueError(f"WFS_SNAPSHOT_MODE must be one of {_MODES}, got {mode!r}")

    # Plan-capture mode (r11 verdict #4/#6): a materialized snapshot
    # starts the captured plan at "Scan ExistingRDD", blinding
    # PLAN_METRICS to everything upstream — exactly where regressions
    # hide. WFS_NO_SNAPSHOT=1 makes every site a no-op so
    # tools/plan_metrics.py can explain the FULL logical plan. Never
    # set it for timed runs: it restores the exponential re-planning
    # the snapshots exist to prevent.
    if os.environ.get("WFS_NO_SNAPSHOT") == "1":
        return lambda df: df

    def _apply(df: DataFrame) -> DataFrame:
        if mode == "reliable":
            sc = df.sparkSession.sparkContext
            if sc.getCheckpointDir() is None:
                ckpt = os.environ.get("WFS_CHECKPOINT_DIR")
                if not ckpt:
                    raise RuntimeError(
                        "WFS_SNAPSHOT_MODE=reliable needs a checkpoint dir: "
                        "set WFS_CHECKPOINT_DIR or call setCheckpointDir"
                    )
                sc.setCheckpointDir(ckpt)
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    return _apply
