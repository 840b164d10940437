"""Distributed global-order primitives (rank / ntile / prefix aggregates).

A plain ``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
table onto ONE task (Spark warns ``WindowExec: No Partition Defined``) — a
scale-killer when the input is per-customer or per-key state that can reach
billions of rows. Every helper here keeps the same semantics while staying
distributed, using the two-pass pattern proven by ``q_orders_abc_pareto``:

1. ``repartitionByRange`` on the total order, so partition *i* holds a
   contiguous range of the sort order and ``spark_partition_id()`` ascends
   with it;
2. a per-partition window computes the local quantity (row_number, running
   max, ...);
3. the per-partition summaries (ONE row per partition) cumulate on the
   driver-adjacent tiny table and broadcast back as offsets.

Prefix sums / maxima / counts are partition-boundary-invariant, so the
result is bit-identical to the single-partition window the SQL oracle runs.

The order passed in MUST be total (include a unique tie-break column) —
range partitioning may split equal keys across a boundary, and only a total
order makes the local row_number + offset reconstruction exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# internal column names, dropped before returning
_PID = "__go_pid"
_LOC = "__go_loc"
_OFF = "__go_off"


def _snapshot(local: DataFrame) -> DataFrame:
    """Materialize the range-parted local table once so the two
    consumers below it — the per-partition offsets aggregate and the
    output join — read a computed snapshot instead of each re-planning
    the whole upstream subtree.

    Without this, every helper call multiplies its input plan ~3x
    (local + offsets + the caller's reuse of ``df``), and CHAINED calls
    compound exponentially — q_customer_rfm's three ntiles planned 224
    shuffle exchanges / 108 parquet scans for a 3-exchange computation
    (r11 measurement). The snapshot pins pass 1 of the documented
    two-pass pattern: compute the ranged table once, derive offsets
    from it, join them back. Values are unchanged (the subtree is
    deterministic), only the number of times it executes.

    Mechanism and fault-tolerance posture live in
    :mod:`weather_flink_spark.operators.snapshot` (lineage truncation
    via localCheckpoint by default — NOT recompute-on-executor-loss
    like persist(); WFS_SNAPSHOT_MODE=reliable switches every site to a
    fault-tolerant reliable checkpoint for cluster runs)."""
    from weather_flink_spark.operators.snapshot import snapshot

    return local.transform(snapshot(eager=False))


def _range_parted(df: DataFrame, order_cols: list[Column], num_partitions: int | None):
    if num_partitions is not None:
        parted = df.repartitionByRange(num_partitions, *order_cols)
    else:
        parted = df.repartitionByRange(*order_cols)
    return parted.withColumn(_PID, F.spark_partition_id())


def attach_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number in the given total order.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY ...)`` but distributed:
    range-shuffle + per-partition row_number + broadcast count offsets.
    """
    local = _snapshot(
        _range_parted(df, order_cols, num_partitions).withColumn(
            _LOC, F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
        )
    )
    wprev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.count("*").alias("__go_n"))
        .withColumn(_OFF, F.coalesce(F.sum("__go_n").over(wprev), F.lit(0)))
        .select(_PID, _OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_LOC) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LOC, _OFF)
    )


def attach_global_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column],
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``NTILE(n) OVER (ORDER BY ...)`` without a global window.

    NTILE is a closed-form function of the global rank r and the total row
    count N: with q = N div n and rem = N mod n, the first ``rem`` buckets
    hold q+1 rows and the rest q, so

        ntile(r) = ceil(r / (q+1))                      if r <= rem*(q+1)
                 = rem + ceil((r - rem*(q+1)) / q)      otherwise

    The rank comes from :func:`attach_global_row_number`; N joins in as a
    broadcast scalar. Integer ceil uses (a + b - 1) div b, and the second
    branch guards q >= 1 (when N < n the first branch always applies).
    """
    rn = "__go_rn"
    ranked = attach_global_row_number(df, order_cols, out_col=rn, num_partitions=num_partitions)
    # N == max global rank (the order is total), read from the ranked
    # snapshot — re-aggregating ``df`` here would duplicate the whole
    # input subtree a fourth time per ntile call
    tot = ranked.agg(F.max(rn).cast("long").alias("__go_N"))
    N = F.col("__go_N")
    r = F.col(rn)

    # Integer division via (a - a%b)/b: the numerator is an exact multiple
    # of b, so the double division is exact for counts below 2^53 (~9e15
    # rows — far past 100 TB of per-key state); results cast back to long.
    q = ((N - N % n) / n).cast("long")  # N div n
    rem = N % n
    head = rem * (q + 1)
    safe_q = F.greatest(q, F.lit(1))  # second branch unreachable when q == 0

    def iceil(a: Column, b: Column) -> Column:
        num = a + b - 1
        return ((num - num % b) / b).cast("long")  # ceil(a/b), positive ints

    ntile = F.when(r <= head, iceil(r, q + 1)).otherwise(rem + iceil(r - head, safe_q))
    return (
        ranked.join(F.broadcast(tot))
        .withColumn(out_col, ntile.cast("int"))
        .drop(rn, "__go_N")
    )


def attach_exclusive_prefix_max(
    df: DataFrame,
    order_cols: list[Column],
    val_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``MAX(val) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)``.

    Distributed two-pass prefix max: local exclusive running max inside each
    range partition, then each partition's total max cumulates (exclusively)
    over the tiny per-partition table and broadcasts back; the global
    exclusive prefix max is greatest(local, offset). NULL for the first row
    (empty preceding frame), matching the window semantics.
    """
    local_w = (
        Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    )
    local = _snapshot(
        _range_parted(df, order_cols, num_partitions).withColumn(
            _LOC, F.max(val_col).over(local_w)
        )
    )
    wprev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.max(val_col).alias("__go_pmax"))
        .withColumn(_OFF, F.max("__go_pmax").over(wprev))
        .select(_PID, _OFF)
    )
    combined = F.when(
        F.col(_LOC).isNull(), F.col(_OFF)
    ).when(F.col(_OFF).isNull(), F.col(_LOC)).otherwise(F.greatest(F.col(_LOC), F.col(_OFF)))
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, combined)
        .drop(_PID, _LOC, _OFF)
    )


def attach_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    val_col: str,
    out_col: str,
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``SUM(val) OVER (ORDER BY ...)`` (inclusive by default, or the
    exclusive ``... TO 1 PRECEDING`` frame) — the distributed two-pass
    prefix sum.

    Use with INTEGRAL (or DECIMAL) ``val_col`` when bit-exact parity
    with a single-partition SQL window matters: integer addition is
    associative, so the partition-boundary regrouping cannot change the
    result. (Double sums would be order-sensitive.)
    """
    hi = -1 if exclusive else 0
    local_w = (
        Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, hi)
    )
    local = _snapshot(
        _range_parted(df, order_cols, num_partitions).withColumn(
            _LOC, F.sum(val_col).over(local_w)
        )
    )
    wprev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.sum(val_col).alias("__go_psum"))
        .withColumn(_OFF, F.sum("__go_psum").over(wprev))
        .select(_PID, _OFF)
    )
    combined = F.coalesce(F.col(_LOC), F.lit(0)) + F.coalesce(F.col(_OFF), F.lit(0))
    # exclusive frame on the very first row is an empty frame => NULL
    if exclusive:
        combined = F.when(F.col(_LOC).isNull() & F.col(_OFF).isNull(), F.lit(None)).otherwise(
            combined
        )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, combined)
        .drop(_PID, _LOC, _OFF)
    )
