"""Chunked, resumable sf10 scaling sweep (VERDICT r6 item 4: extend
SCALING_SF10 coverage from 71 toward the full registry).

Every widening of the sf10 table so far has caught exactly one
scale-class defect the previous instruments missed (r5: five
single-partition windows; r6: the semantic_dedup capped-K quadratic),
so coverage is the instrument. This runner owns the merged state:

- SCALING_SF10.json is the cumulative per-query store (bootstrapped
  from the committed SCALING_SF10.md table on first run);
- each chunk of CHUNK queries runs scripts/scaling_curve.py --sf10 in
  its own subprocess at SPARK_GRAFT_DRIVER_MEM=24g (the round-6
  memory lesson: one 71-query session starved an 8g heap's execution
  pool at sf10 — and a fresh JVM per chunk is closer to how a real
  cluster amortizes per-session state);
- results merge into the JSON and SCALING_SF10.md regenerates after
  EVERY chunk, so the sweep is crash-safe and resumable: already-
  measured queries are skipped on restart.

Usage:
    python scripts/sf10_sweep.py            # most-expensive-first backlog
    python scripts/sf10_sweep.py --limit=80 # stop after ~80 new queries
    python scripts/sf10_sweep.py q1 q2 ...  # explicit queries
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HERE = Path(__file__).resolve().parent.parent
STORE = HERE / "SCALING_SF10.json"
MD = HERE / "SCALING_SF10.md"
CHUNK = 12
CHUNK_TIMEOUT_S = 2400

SFS = ("0.1", "1", "10")


def bootstrap_store() -> dict:
    """Parse the committed SCALING_SF10.md table into the JSON store."""
    queries: dict[str, dict] = {}
    rows = {}
    if MD.exists():
        text = MD.read_text()
        m = re.search(r"sf0.1=([\d,]+), sf1=([\d,]+), sf10=([\d,]+)", text)
        if m:
            rows = {
                "0.1": int(m.group(1).replace(",", "")),
                "1": int(m.group(2).replace(",", "")),
                "10": int(m.group(3).replace(",", "")),
            }
        for line in text.splitlines():
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cells) >= 5 and re.match(r"^[a-z0-9_]+$", cells[0]):
                # only the MAIN per-query table: its flag column is
                # empty or SUPERLINEAR. The r6 MD also contained a
                # before/after rewrite table whose rows this regex
                # matches — taking those produced 12 corrupt entries
                # on the first bootstrap (caught by their numeric
                # 'flag'), so anything else is rejected here.
                if len(cells) > 5 and cells[5] not in ("", "SUPERLINEAR"):
                    continue
                try:
                    queries[cells[0]] = {
                        "sec_sf0.1": float(cells[1]),
                        "sec_sf1": float(cells[2]),
                        "sec_sf10": float(cells[3]),
                        "alpha": float(cells[4]),
                        "flag": cells[5] if len(cells) > 5 else "",
                    }
                except ValueError:
                    continue
    return {"rows": rows, "queries": queries}


def load_store() -> dict:
    if STORE.exists():
        return json.loads(STORE.read_text())
    store = bootstrap_store()
    STORE.write_text(json.dumps(store, indent=1) + "\n")
    return store


def write_md(store: dict) -> None:
    rows = store["rows"]
    report = store["queries"]
    rows_line = ", ".join(f"sf{sf}={rows.get(sf, 0):,}" for sf in SFS)
    lines = [
        "# SCALING_SF10 — measured growth exponents (round 7)",
        "",
        "Produced by `python scripts/sf10_sweep.py` on local[32]: chunked",
        f"{CHUNK}-query scaling_curve.py --sf10 subprocesses at",
        "SPARK_GRAFT_DRIVER_MEM=24g (round-6 memory lesson), merged into",
        "SCALING_SF10.json after every chunk (crash-safe/resumable).",
        f"Rows (lineitem): {rows_line}.",
        "sf1/sf10 are the deterministic chained 10x key-shifted upscales",
        "(scripts/make_sf1.py / make_sf10.py) — per-key cardinalities and join",
        "selectivities preserved, content perturbed per replica.",
        "",
        "alpha = log(t_sf10/t_sf1) / log(rows_sf10/rows_sf1) — the empirical",
        "growth exponent over the largest measured step (smaller steps are",
        "fixed-overhead-dominated and not fitted). alpha <= ~1 is",
        "linear-or-better in rows; > 1.3 is flagged. Timings are second-pass",
        "(warm caches + shared index stages), matching bench.py's",
        "steady-state methodology.",
        "",
        f"Coverage (VERDICT r6 item 4): {len(report)} of the registered",
        "queries — the r6 71-query set (60 most expensive + every",
        "single-partition-window rewrite) extended toward the full registry,",
        "most-expensive-first by the full-registry bench.",
        "",
        "| query | sf0.1 s | sf1 s | sf10 s | alpha | flag |",
        "|---|---|---|---|---|---|",
    ]
    for q in sorted(report, key=lambda q: -report[q]["alpha"]):
        r = report[q]
        lines.append(
            f"| {q} | {r['sec_sf0.1']} | {r['sec_sf1']} | {r['sec_sf10']} "
            f"| {r['alpha']} | {r.get('flag', '')} |"
        )
    lines += [
        "",
        "Reading: with ~10x more rows per SF decade, per-query fixed costs",
        "(plan compile, stage launch, Python worker fleet) dominate the small",
        "SFs, which depresses alpha; a genuinely superlinear plan still shows",
        "alpha well above 1 on the top step. Queries flagged SUPERLINEAR get",
        "a plan re-audit before the next round.",
    ]
    MD.write_text("\n".join(lines) + "\n")


def backlog(store: dict, explicit: list[str], limit: int | None) -> list[str]:
    from streams_prototyping_spark import registry

    registry.load_all()
    if explicit:
        return [q for q in explicit if q not in store["queries"]]
    full = HERE / "BENCH_LOCAL_FULL.json"
    cost = json.loads(full.read_text())["queries"] if full.exists() else {}
    todo = [q for q in sorted(registry.QUERIES) if q not in store["queries"]]
    todo.sort(key=lambda q: -cost.get(q, 0.0))
    return todo[:limit] if limit else todo


def main() -> None:
    explicit = [a for a in sys.argv[1:] if not a.startswith("--")]
    limit = next(
        (int(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--limit=")),
        None,
    )
    store = load_store()
    todo = backlog(store, explicit, limit)
    print(
        json.dumps(
            {"already_measured": len(store["queries"]), "to_measure": len(todo)}
        ),
        flush=True,
    )
    import os

    for i in range(0, len(todo), CHUNK):
        chunk = todo[i : i + CHUNK]
        env = dict(os.environ)
        env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    str(HERE / "scripts" / "scaling_curve.py"),
                    "--sf10",
                    *chunk,
                ],
                capture_output=True,
                text=True,
                env=env,
                timeout=CHUNK_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            print(
                json.dumps({"chunk": chunk, "error": f"hung > {CHUNK_TIMEOUT_S}s"}),
                flush=True,
            )
            continue
        rec = None
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
        if rec is None:
            print(
                json.dumps(
                    {
                        "chunk": chunk,
                        "error": "no record",
                        "stderr_tail": out.stderr[-500:],
                    }
                ),
                flush=True,
            )
            continue
        store["rows"] = {
            str(sf): n for sf, n in rec["rows"].items()
        } or store["rows"]
        for q, r in rec["queries"].items():
            store["queries"][q] = {
                "sec_sf0.1": r.get("sec_sf0.1"),
                "sec_sf1": r.get("sec_sf1"),
                "sec_sf10": r.get("sec_sf10"),
                "alpha": r["alpha"],
                "flag": r.get("flag", ""),
            }
        STORE.write_text(json.dumps(store, indent=1) + "\n")
        write_md(store)
        worst = (
            max(rec["queries"].items(), key=lambda kv: kv[1]["alpha"])
            if rec["queries"]
            else None
        )
        print(
            json.dumps(
                {
                    "chunk_done": f"{i + len(chunk)}/{len(todo)}",
                    "total_measured": len(store["queries"]),
                    "chunk_worst_alpha": (
                        [worst[0], worst[1]["alpha"]] if worst else None
                    ),
                }
            ),
            flush=True,
        )
    flagged = {
        q: r["alpha"] for q, r in store["queries"].items() if r.get("flag")
    }
    print(
        json.dumps(
            {"measured": len(store["queries"]), "superlinear": flagged}
        )
    )


if __name__ == "__main__":
    main()
