"""Per-query wall-clock budget checker (round-7 verdict task #2).

BASELINE_PERQ.json is the committed machine-readable per-query
baseline: ``{entry: {"seconds": s, "round": "rN", "protocol": ...}}``.
This script compares a bench table (default the repo's BENCH_SELF.json)
against it and exits nonzero iff any entry exceeds the regression
budget: ratio > 2x AND absolute delta > 0.3 s (the absolute floor keeps
millisecond-scale entries from flagging on scheduler jitter — the
±10-31 s ambient band BASELINE.md documents shows up as +0.1-0.5 s per
entry on an idle machine).

Usage:
    python tools/bench_budget.py                       # check BENCH_SELF.json
    python tools/bench_budget.py --bench /tmp/run.json # check another table
    python tools/bench_budget.py --rebaseline f1.json f2.json ... --round r7
        # rewrite BASELINE_PERQ.json as the per-query MIN over the given
        # bench tables (the merged best-of protocol BASELINE.md defines)

Wall-clock is the SANITY BAND here, not the primary gate — structural
regressions are caught deterministically by tools/plan_metrics.py +
tests/test_plan_metrics.py (round-7 verdict task #1).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# canonical invocation is `python tools/bench_budget.py`, which puts
# tools/ (not the repo root) at sys.path[0] — insert the root so the
# registry import in check() works outside pytest (ADVICE r8, medium)
sys.path.insert(0, str(REPO))
BASELINE_PATH = REPO / "BASELINE_PERQ.json"

RATIO_LIMIT = 2.0
ABS_FLOOR_SEC = 0.3
# bench.py's calibration-subset ratio above which the whole window is
# machine-wide degraded: flags are labeled "re-time before believing"
# (exit code 2) instead of hard over-budget failures (exit code 1)
AMBIENT_DEGRADED = 1.5
# r10 verdict task #3: the flag band scales with the measured ambient
# factor, BOUNDED at this cap — co-tenant contention (which inflates the
# calibration subset and the entries alike) stops burning waivers, while
# a genuine code regression (which scales WITH ambient, so its raw ratio
# is regression x ambient) still lands past the scaled band. The cap
# keeps a heavily loaded window from masking real regressions outright:
# past the cap the window is degraded anyway (exit 2, re-time protocol).
AMBIENT_BAND_CAP = 1.5


def band_scale(ambient: float | None) -> float:
    """Bounded ambient normalization applied to RATIO_LIMIT."""
    if ambient is None:
        return 1.0
    return min(max(ambient, 1.0), AMBIENT_BAND_CAP)


def load_queries(path: Path) -> tuple[dict[str, float], float | None]:
    # bench.py emits the full table first and a truncated tail summary
    # last — take the line with the largest query table; carry its
    # ambient_factor (the calibration-subset ratio bench.py measures)
    best: dict[str, float] = {}
    ambient: float | None = None
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        q = d["queries"] if "queries" in d else d
        if len(q) > len(best):
            best = q
            ambient = d.get("ambient_factor") if isinstance(d, dict) else None
    return best, ambient


def rebaseline(files: list[str], round_tag: str, protocol: str) -> None:
    best: dict[str, float] = {}
    for f in files:
        for k, v in load_queries(Path(f))[0].items():
            best[k] = min(best.get(k, v), v)
    out = {
        k: {"seconds": round(v, 3), "round": round_tag, "protocol": protocol}
        for k, v in sorted(best.items())
    }
    BASELINE_PATH.write_text(json.dumps(out, indent=1) + "\n")
    total = round(sum(v for v in best.values()), 1)
    print(
        f"wrote {BASELINE_PATH.name}: {len(out)} entries, "
        f"merged-best total {total} s ({total / len(out):.3f} s/q)"
    )


def over_entries(
    bench: dict[str, float],
    baseline: dict,
    adjudications: dict,
    ambient: float | None = None,
) -> list[tuple[str, float, float, float]]:
    """(name, baseline_s, bench_s, ratio) for every entry past the
    ambient-scaled >RATIO_LIMIT and >ABS_FLOOR_SEC budget, minus
    bounded waivers. Raw ratios are reported; only the flag threshold
    is ambient-normalized (bounded at AMBIENT_BAND_CAP)."""
    limit = RATIO_LIMIT * band_scale(ambient)
    over: list[tuple[str, float, float, float]] = []
    for k, v in bench.items():
        base = baseline.get(k)
        if base is None:
            continue  # new entry since the baseline: no budget yet
        b = base["seconds"]
        if v > limit * b and v - b > ABS_FLOOR_SEC:
            adj = adjudications.get(k)
            if adj and v <= adj["max_seconds"]:
                continue
            over.append((k, b, v, v / b if b else float("inf")))
    return over


def load_tables(bench_file: Path) -> tuple[dict[str, float], float | None, dict, dict]:
    baseline = json.loads(BASELINE_PATH.read_text())
    adjudications: dict = {}
    adj_path = REPO / "BENCH_ADJUDICATIONS.json"
    if adj_path.exists():
        adjudications = json.loads(adj_path.read_text())
    bench, ambient = load_queries(bench_file)
    return bench, ambient, baseline, adjudications


def add_new(
    bench_file: Path, round_tag: str, protocol: str, force: bool = False
) -> None:
    """Add entries present in the bench table but absent from the
    baseline (first recorded time for new operators); existing
    baseline rows — the accumulated merged-best mins — are untouched.

    Refuses inside a degraded ambient window (ambient_factor >
    AMBIENT_DEGRADED) unless ``force``: a first-observed time taken
    under machine-wide load would become the permanent baseline and
    loosen that entry's 2x budget forever (ADVICE r8, low)."""
    baseline = json.loads(BASELINE_PATH.read_text())
    bench, ambient = load_queries(bench_file)
    if ambient is not None and ambient > AMBIENT_DEGRADED and not force:
        print(
            f"REFUSED: ambient_factor {ambient} > {AMBIENT_DEGRADED} — new "
            "baselines taken in a degraded window inflate the budget "
            "permanently; re-run in a clean window or pass --force"
        )
        sys.exit(1)
    added = 0
    for k, v in sorted(bench.items()):
        if k not in baseline:
            baseline[k] = {
                "seconds": round(v, 3),
                "round": round_tag,
                "protocol": protocol,
            }
            added += 1
            print(f"NEW BASELINE {k}: {v:.3f} s")
    BASELINE_PATH.write_text(
        json.dumps(dict(sorted(baseline.items())), indent=1) + "\n"
    )
    print(f"added {added} new entries; {len(baseline)} total baselined")


def check(bench_file: Path) -> int:
    bench, ambient, baseline, adjudications = load_tables(bench_file)
    degraded = ambient is not None and ambient > AMBIENT_DEGRADED
    limit = RATIO_LIMIT * band_scale(ambient)
    if ambient is not None:
        label = "DEGRADED window" if degraded else "ok"
        print(
            f"ambient_factor {ambient} ({label}, threshold {AMBIENT_DEGRADED}); "
            f"flag band {RATIO_LIMIT}x scaled to {limit:.2f}x "
            f"(cap {AMBIENT_BAND_CAP})"
        )
    missing = [k for k in baseline if k not in bench]
    # A baseline entry absent from the bench table is a silent gap
    # (renamed, or skipped before timing) — fail it like an over-budget
    # entry UNLESS it was deliberately dropped from the registry too
    # (then it's a stale baseline row: WARN, prune on next rebaseline).
    missing_live: list[str] = []
    if missing:
        try:
            from weather_flink_spark.plans.registry import all_specs

            live = set(all_specs())
        except Exception as exc:  # registry unimportable: treat all as live
            print(f"WARN: registry import failed ({exc}); all missing treated as live")
            live = set(missing)
        for k in missing:
            if k in live:
                missing_live.append(k)
                print(f"MISSING {k}: baselined + registered but absent from bench table")
            else:
                print(f"WARN stale-baseline {k}: no longer in the registry")
    # transparency: entries past the RAW 2x band but inside the
    # ambient-scaled band are recorded (not flagged) — the raw number
    # stays visible so a pattern across rounds is still catchable
    for k, v in sorted(bench.items()):
        base = baseline.get(k)
        if not base:
            continue
        b = base["seconds"]
        if RATIO_LIMIT * b < v <= limit * b and v - b > ABS_FLOOR_SEC:
            print(
                f"AMBIENT-MASKED {k}: baseline {b:.3f} s -> {v:.3f} s "
                f"({v / b:.2f}x raw, inside the {limit:.2f}x "
                f"ambient-scaled band)"
            )
    # a recorded adjudication waives a flag ONLY while the measurement
    # stays under its stated ceiling — a real regression past the
    # ceiling still fails (waivers applied inside over_entries)
    for k, v in bench.items():
        adj = adjudications.get(k)
        base = baseline.get(k)
        if (
            adj
            and base
            and v > limit * base["seconds"]
            and v - base["seconds"] > ABS_FLOOR_SEC
            and v <= adj["max_seconds"]
        ):
            print(
                f"ADJUDICATED {k}: {v:.3f} s (<= {adj['max_seconds']} s "
                f"waiver, {adj['round']}: {adj['reason']})"
            )
    over = over_entries(bench, baseline, adjudications, ambient)
    for k, b, v, r in sorted(over, key=lambda t: -t[3]):
        if degraded:
            print(
                f"OVER-BUDGET-IN-DEGRADED-WINDOW {k}: baseline {b:.3f} s -> "
                f"{v:.3f} s ({r:.2f}x) — ambient {ambient}x: "
                "re-time before believing"
            )
        else:
            print(f"OVER-BUDGET {k}: baseline {b:.3f} s -> {v:.3f} s ({r:.2f}x)")
    n_new = len([k for k in bench if k not in baseline])
    print(
        f"{len(bench)} benched / {len(baseline)} baselined "
        f"({n_new} new, {len(missing)} missing from bench): "
        f"{len(over)} over-budget (> {limit:.2f}x and > {ABS_FLOOR_SEC}s), "
        f"{len(missing_live)} live-but-unbenched"
    )
    if over and degraded and not missing_live:
        return 2  # suspect flags only: re-time in a clean window
    return 1 if over or missing_live else 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=str(REPO / "BENCH_SELF.json"))
    ap.add_argument("--rebaseline", nargs="+", metavar="BENCH_JSON")
    ap.add_argument("--round", default="r7")
    ap.add_argument(
        "--protocol",
        default="per-query min over idle sf0.1 local[32] best-of-2 runs",
    )
    ap.add_argument(
        "--add-new",
        action="store_true",
        help="add bench entries missing from the baseline (first "
        "recorded time for new operators); existing rows untouched",
    )
    ap.add_argument(
        "--force",
        action="store_true",
        help="allow --add-new inside a degraded ambient window",
    )
    args = ap.parse_args()
    if args.rebaseline:
        rebaseline(args.rebaseline, args.round, args.protocol)
        return
    if args.add_new:
        add_new(Path(args.bench), args.round, args.protocol, force=args.force)
        return
    sys.exit(check(Path(args.bench)))


if __name__ == "__main__":
    main()
