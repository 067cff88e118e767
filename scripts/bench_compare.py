"""Bench regression guardrail (VERDICT r1 item 4).

Compares a bench run against the recorded round-1 baseline
(BENCH_r01.json) PER QUERY, not just the total — so a new addition
can't silently blow the driver's 2x gate on an individual query.

Usage:
    python scripts/bench_compare.py                # runs bench.py fresh
    python scripts/bench_compare.py bench_out.json # compares a saved run
                                                   # ({"queries": {...}} or
                                                   # a BENCH_r*.json wrapper)

Exit 1 if any shared query regressed beyond THRESHOLD (default 2.0,
override with BENCH_REGRESSION_THRESHOLD). New queries (absent from
the baseline) are listed informationally and never fail the check.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE_PATH = REPO / "BENCH_r01.json"
THRESHOLD = float(os.environ.get("BENCH_REGRESSION_THRESHOLD", "2.0"))
# Sub-second queries are dominated by fixed per-query overhead (plan +
# task scheduling at local[32]) whose run-to-run jitter is ±0.3-0.5 s;
# a ratio alone would cry wolf there, so a regression must ALSO cost
# at least this much absolute wall-clock.
MIN_ABS_DELTA_SEC = 1.0


def _load_queries(path: Path) -> dict[str, float]:
    data = json.loads(path.read_text())
    if "queries" in data:
        return data["queries"]
    if "parsed" in data and "queries" in data["parsed"]:
        return data["parsed"]["queries"]
    raise SystemExit(f"{path}: no 'queries' dict found")


def main() -> None:
    baseline = _load_queries(BASELINE_PATH)

    if len(sys.argv) > 1:
        current = _load_queries(Path(sys.argv[1]))
    else:
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True,
            text=True,
        )
        json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not json_lines:
            sys.stderr.write(proc.stderr[-2000:])
            raise SystemExit(
                f"bench.py produced no JSON line (rc={proc.returncode}) — see stderr above"
            )
        current = json.loads(json_lines[-1])["queries"]

    regressions: list[str] = []
    print(f"{'query':34s} {'r01':>8s} {'now':>8s} {'ratio':>7s}")
    for name in sorted(set(baseline) | set(current)):
        old, new = baseline.get(name), current.get(name)
        if old is None:
            print(f"{name:34s} {'--':>8s} {new:8.3f}    new")
            continue
        if new is None:
            print(f"{name:34s} {old:8.3f} {'--':>8s}    dropped")
            continue
        ratio = new / old if old > 0 else float("inf")
        flag = ""
        if ratio > THRESHOLD:
            if new - old >= MIN_ABS_DELTA_SEC:
                flag = f"  REGRESSION >{THRESHOLD}x"
                regressions.append(name)
            else:
                flag = "  warn (ratio high, delta in noise band)"
        print(f"{name:34s} {old:8.3f} {new:8.3f} {ratio:6.2f}x{flag}")

    tot_old = sum(v for k, v in baseline.items() if k in current)
    tot_new = sum(v for k, v in current.items() if k in baseline)
    if tot_old == 0:
        raise SystemExit(
            "no shared queries between baseline and current run — wrong file?"
        )
    print(
        f"\nshared-query total: r01={tot_old:.2f}s now={tot_new:.2f}s "
        f"({tot_new / tot_old:.2f}x)"
    )
    if regressions:
        print(f"FAIL: {len(regressions)} regressed: {', '.join(regressions)}")
        sys.exit(1)
    print("OK: no per-query regression beyond threshold")


if __name__ == "__main__":
    main()
