"""Optimization probe (r11): per-query plan capture + noop-sink timing.

For each named registry entry: capture ``.explain("formatted")`` to
``plans/r11/<name>_<tag>.txt`` and time the computation with the noop
sink (guide §1.4 — every column of every row computed, output
discarded), best-of-N, printed as one line per query.

Usage:
    python tools/opt_probe.py --tag before [--sf /root/testdata/sf0.1]
        [--n 3] [--no-plan] names...
"""

from __future__ import annotations

import argparse
import io
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from weather_flink_spark.plans.registry import all_specs  # noqa: E402
from weather_flink_spark.session import get_spark  # noqa: E402

PLAN_DIR = Path(__file__).resolve().parent.parent / "plans" / "r12"


def plan_summary(text: str) -> str:
    """One-line plan shape: counts of the nodes the guide says to watch."""
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", text)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", text)),
        "SMJ": len(re.findall(r"SortMergeJoin", text)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", text)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "Cart": len(re.findall(r"CartesianProduct", text)),
        "PyEval": len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", text)),
        "Scan": len(re.findall(r"Scan parquet", text)),
        "InMem": len(re.findall(r"InMemoryTableScan", text)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--warm", default="", help="comma-separated cache prelude warmup entries")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt-probe")
    specs = all_specs()
    # JVM/codegen warmup (mirrors bench.py)
    specs["q_agg_groupby"].fn(spark, args.sf).count()
    for w in [x for x in args.warm.split(",") if x]:
        specs[w].fn(spark, args.sf).count()

    PLAN_DIR.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        spec = specs[name]
        df = spec.fn(spark, args.sf)
        if not args.no_plan:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            (PLAN_DIR / f"{name}_{args.tag}.txt").write_text(text)
        else:
            text = ""
        if args.plan_only:
            print(f"{name}: [{plan_summary(text)}]", flush=True)
            continue
        best = float("inf")
        times = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            # fresh plan each pass so driver-side composition is included
            spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        print(
            f"{name}: best={best:.3f}s times={times} "
            f"[{plan_summary(text)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
