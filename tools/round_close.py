"""One-command round-close gate (r7 'left on the table' + verdict #5).

Default mode runs, in order, the cheap deterministic gates and exits
nonzero if ANY fails:

1. plan-structure check vs the committed PLAN_METRICS.json
   (deterministic — the primary perf gate);
2. per-query wall-clock budget vs BASELINE_PERQ.json (the sanity
   band; expects a fresh BENCH_SELF.json or --bench);
3. an oracle spot-sample (every Nth registry entry by sorted name,
   default step 12 => ~30 queries) via tools/oracle_check.py;
4. entry() smoke: >0 rows at sf0.001.

``--close`` is the full round-close flow (r7 verdict #5 — the
dirty-tree-at-close fix): re-run bench.py fresh, run the gates, and if
the budget check flags entries INSIDE a degraded ambient window
(bench_budget exit 2), re-time exactly those entries in isolation
(SPARK_GRAFT_BENCH_ONLY subset run). Entries clean in isolation get a
BOUNDED waiver written to BENCH_ADJUDICATIONS.json (ceiling = the
isolated time + the budget headroom, reason recorded); entries still
over in isolation FAIL — that's a real regression. Finally ``git add``
the bench/driver artifacts and commit, so round close leaves
``git status`` clean.

The FULL gates (complete oracle sweep, full pytest, full bench) still
run at round close; the default mode is the cheap always-run subset.

Usage:
    python tools/round_close.py [--bench BENCH_SELF.json] [--step 12]
    python tools/round_close.py --close [--round r8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARTIFACTS = [
    "BENCH_SELF.json",
    "BENCH_ADJUDICATIONS.json",
    "PLAN_METRICS.json",
    "BASELINE_PERQ.json",
    "BASELINE.md",
]
DRIVER_ARTIFACT_GLOBS = ["BENCH_r*.json", "CORRECTNESS_r*.json", "VERDICT.md", "ADVICE.md"]


def run(title: str, cmd: list[str], env: dict | None = None) -> int:
    print(f"== {title}: {' '.join(cmd)}")
    rc = subprocess.run(
        cmd, cwd=REPO, env={**os.environ, **(env or {})}
    ).returncode
    print(f"== {title}: {'OK' if rc == 0 else f'rc={rc}'}\n")
    return rc


def gates(bench_path: str, step: int) -> tuple[bool, int]:
    """Run the four cheap gates.

    Returns ``(ok_other_gates, budget_rc)`` — the budget result is kept
    SEPARATE from the plan-metrics / oracle-sample / entry-smoke result
    so close mode can adjudicate a degraded-window budget flag without
    masking a failure from any other gate (ADVICE r8, high).
    """
    ok_other = True
    ok_other &= run("plan-metrics", [sys.executable, "tools/plan_metrics.py"]) == 0
    budget_rc = run(
        "bench-budget",
        [sys.executable, "tools/bench_budget.py", "--bench", bench_path],
    )

    from weather_flink_spark.plans.registry import all_specs

    sample = sorted(all_specs())[::step]
    ok_other &= (
        run(
            f"oracle-sample ({len(sample)} queries)",
            [sys.executable, "tools/oracle_check.py", *sample],
        )
        == 0
    )

    print("== entry smoke")
    import __spark_entry__ as entrymod

    from weather_flink_spark.session import get_spark

    n = entrymod.entry(get_spark("round-close")).count()
    smoke = n > 0
    print(f"== entry smoke: {'OK' if smoke else 'FAIL'} ({n} rows)\n")
    ok_other &= smoke
    return bool(ok_other), budget_rc


def open_mode(round_tag: str) -> int:
    """Round-OPEN ingestion (r8 verdict task #7): the driver re-runs
    bench/correctness AFTER the builder's close commit, leaving
    BENCH_r{N}.json / CORRECTNESS_r{N}.json / BENCH_SELF.json dirty at
    the next round's start. Make committing them the scripted FIRST
    act of the new round so the perennial dirty-tree nit ends
    structurally. No-op when the tree is already clean."""
    paths: list[str] = []
    for g in [*DRIVER_ARTIFACT_GLOBS, "BENCH_SELF.json"]:
        paths.extend(str(p.relative_to(REPO)) for p in REPO.glob(g))
    subprocess.run(["git", "add", *paths], cwd=REPO, check=True)
    dirty = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=REPO
    ).returncode
    if not dirty:
        print("round-open: driver artifacts already committed, tree clean")
        return 0
    subprocess.run(
        [
            "git",
            "commit",
            "-m",
            f"round open ({round_tag}): ingest driver bench/correctness artifacts",
        ],
        cwd=REPO,
        check=True,
    )
    print("round-open: committed driver artifacts")
    return 0


def close_mode(round_tag: str, step: int) -> int:
    bench_path = str(REPO / "BENCH_SELF.json")
    if run("fresh bench", [sys.executable, "bench.py"]) != 0:
        return 1
    ok_other, budget_rc = gates(bench_path, step)
    ok = ok_other and budget_rc == 0

    if budget_rc == 2:
        # degraded ambient window: re-time the flagged entries in
        # isolation and adjudicate each with a bounded waiver or fail
        import tools.bench_budget as bb

        bench, ambient, baseline, adjudications = bb.load_tables(
            Path(bench_path)
        )
        flagged = bb.over_entries(bench, baseline, adjudications)
        names = ",".join(k for k, *_ in flagged)
        iso_path = REPO / "BENCH_RETIME.json"
        print(f"== degraded window (ambient {ambient}): re-timing {names}")
        if (
            run(
                "isolated re-time",
                [sys.executable, "bench.py"],
                env={
                    "SPARK_GRAFT_BENCH_ONLY": names,
                    "SPARK_GRAFT_BENCH_OUT": iso_path.name,
                    # a fresh subset session rides the C2-JIT warm-up
                    # curve (measured: 19.9 -> 5.1 -> 3.3 -> 2.25 s
                    # over 4 passes of the calibration five); best-of-8
                    # converges near the fully-warm numbers the
                    # committed baselines were taken at
                    "SPARK_GRAFT_BENCH_N": "8",
                },
            )
            != 0
        ):
            return 1
        iso, iso_ambient = bb.load_queries(iso_path)
        iso_path.unlink(missing_ok=True)
        still_over = bb.over_entries(iso, baseline, adjudications)
        if still_over:
            for k, b, v, r in still_over:
                print(
                    f"== REAL REGRESSION {k}: {v:.3f} s isolated "
                    f"(baseline {b:.3f} s, {r:.2f}x)"
                )
            return 1
        for k, b, _v, _r in flagged:
            # bounded waiver: ceiling = what the budget itself allows
            # on the ISOLATED number (so any further real regression
            # past it still fails), reason records both measurements
            iso_v = iso[k]
            ceiling = round(max(bb.RATIO_LIMIT * b, iso_v + bb.ABS_FLOOR_SEC), 3)
            adjudications[k] = {
                "max_seconds": ceiling,
                "round": round_tag,
                "reason": (
                    f"ambient window {ambient}x at close; isolated "
                    f"re-time {iso_v} s (ambient {iso_ambient}) within "
                    f"budget vs baseline {b} s"
                ),
            }
            print(f"== WAIVER {k}: ceiling {ceiling} s (isolated {iso_v} s)")
        (REPO / "BENCH_ADJUDICATIONS.json").write_text(
            json.dumps(adjudications, indent=1) + "\n"
        )
        # degraded flags adjudicated — but a plan-metrics / oracle /
        # smoke failure from the same pass still fails the close
        # (ADVICE r8 high: never let adjudication overwrite them)
        ok = ok_other

    if not ok:
        print("ROUND-CLOSE: RED — not committing artifacts")
        return 1

    # leave the tree clean: stage bench + driver artifacts and commit
    paths = [p for p in ARTIFACTS if (REPO / p).exists()]
    for g in DRIVER_ARTIFACT_GLOBS:
        paths.extend(str(p.relative_to(REPO)) for p in REPO.glob(g))
    subprocess.run(["git", "add", *paths], cwd=REPO, check=True)
    dirty = subprocess.run(
        ["git", "diff", "--cached", "--quiet"], cwd=REPO
    ).returncode
    if dirty:
        subprocess.run(
            [
                "git",
                "commit",
                "-m",
                f"round close ({round_tag}): bench snapshot + driver artifacts",
            ],
            cwd=REPO,
            check=True,
        )
        print("== committed round-close artifacts")
    else:
        print("== artifacts already clean")
    print("ROUND-CLOSE GATE: GREEN")
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=str(REPO / "BENCH_SELF.json"))
    ap.add_argument("--step", type=int, default=12)
    ap.add_argument("--close", action="store_true")
    ap.add_argument(
        "--open",
        action="store_true",
        help="round-open: commit the driver's post-close artifacts as "
        "the first act of the new round (no-op when clean)",
    )
    ap.add_argument("--round", default="r9")
    args = ap.parse_args()

    if args.open:
        sys.exit(open_mode(args.round))
    if args.close:
        sys.exit(close_mode(args.round, args.step))

    ok_other, budget_rc = gates(args.bench, args.step)
    ok = ok_other and budget_rc == 0
    print("ROUND-CLOSE GATE:", "GREEN" if ok else "RED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
