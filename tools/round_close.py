"""One-command round-close gate (round-7 'left on the table' item).

Runs, in order, the three deterministic gates plus the driver-shaped
smoke, and exits nonzero if ANY fails:

1. plan-structure check vs the committed PLAN_METRICS.json
   (deterministic — the primary perf gate);
2. per-query wall-clock budget vs BASELINE_PERQ.json (the sanity
   band; expects a fresh BENCH_SELF.json or --bench);
3. an oracle spot-sample (every Nth registry entry by sorted name,
   default step 12 => ~30 queries) via tools/oracle_check.py;
4. entry() smoke: >0 rows at sf0.001.

The FULL gates (complete oracle sweep, full pytest, full bench) still
run at round close; this is the cheap always-run subset — a failed
step here means don't bother with the long ones yet.

Usage: python tools/round_close.py [--bench BENCH_SELF.json] [--step 12]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(title: str, cmd: list[str]) -> bool:
    print(f"== {title}: {' '.join(cmd)}")
    rc = subprocess.run(cmd, cwd=REPO).returncode
    print(f"== {title}: {'OK' if rc == 0 else f'FAIL (rc={rc})'}\n")
    return rc == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=str(REPO / "BENCH_SELF.json"))
    ap.add_argument("--step", type=int, default=12)
    args = ap.parse_args()

    ok = True
    ok &= run("plan-metrics", [sys.executable, "tools/plan_metrics.py"])
    ok &= run(
        "bench-budget",
        [sys.executable, "tools/bench_budget.py", "--bench", args.bench],
    )

    from weather_flink_spark.plans.registry import all_specs

    sample = sorted(all_specs())[:: args.step]
    ok &= run(
        f"oracle-sample ({len(sample)} queries)",
        [sys.executable, "tools/oracle_check.py", *sample],
    )

    print("== entry smoke")
    import __spark_entry__ as entrymod

    from weather_flink_spark.session import get_spark

    n = entrymod.entry(get_spark("round-close")).count()
    smoke = n > 0
    print(f"== entry smoke: {'OK' if smoke else 'FAIL'} ({n} rows)\n")
    ok &= smoke

    print("ROUND-CLOSE GATE:", "GREEN" if ok else "RED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
