"""Drive the repo's public surface exactly as the driver harness does:
import __spark_entry__ fresh, run entry(spark) (smoke), then every
queries() entry at sf0.01 compared against its oracle_sql() via DuckDB.

Usage: python scripts/drive_driver_contract.py [sf_dir] [json_out]

Set SPARK_GRAFT_QUERIES=name1,name2,... (exact names, or prefix* globs)
to check a subset — used for the targeted sf10 pass where the full
registry's DuckDB oracles would take hours at 60M rows.

When json_out is given, a machine-readable per-query record (the same
schema-match / count-match / value-hash-match triple the driver records
in CORRECTNESS_r{N}.json) is written there — the committable
CORRECTNESS_FULL_r{N}.json artifact covering the WHOLE registry, not
just the driver's fixed 50-query sample.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from streams_prototyping_spark.session import get_spark
from tests.oracle_check import _canon_rows, run_oracle

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
json_out = sys.argv[2] if len(sys.argv) > 2 else None

spark = get_spark("drive-contract")

# --- smoke: entry() ---
t0 = time.time()
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns} ({time.time()-t0:.1f}s)")
assert len(rows) > 0

# --- correctness: queries() vs oracle_sql() ---
qs = entrymod.queries()
oracles = entrymod.oracle_sql()
_only = os.environ.get("SPARK_GRAFT_QUERIES")
if _only:
    pats = [p.strip() for p in _only.split(",") if p.strip()]
    def _want(n: str) -> bool:
        return any(
            n == p or (p.endswith("*") and n.startswith(p[:-1])) for p in pats
        )
    qs = {n: f for n, f in qs.items() if _want(n)}
    unknown = [p for p in pats if not p.endswith("*") and p not in qs]
    if unknown:
        raise SystemExit(f"SPARK_GRAFT_QUERIES names not in registry: {unknown}")
print(f"{len(qs)} queries, {len(oracles)} oracles")
fails = []
records = {}
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        rec = {"rows": len(s_rows), "sec": round(time.time() - t0, 1)}
        if name in oracles:
            o_cols, o_rows = run_oracle(oracles[name], sf_dir)
            ok_schema = sorted(s_cols) == sorted(o_cols)
            ok_count = len(s_rows) == len(o_rows)
            ok_vals = _canon_rows(s_cols, s_rows) == _canon_rows(o_cols, o_rows)
            status = "MATCH" if (ok_schema and ok_count and ok_vals) else (
                f"MISMATCH schema={ok_schema} count={ok_count} vals={ok_vals}"
            )
            rec.update(
                {
                    "oracle": True,
                    "schema_match": ok_schema,
                    "count_match": ok_count,
                    "values_match": ok_vals,
                    "pass": ok_schema and ok_count and ok_vals,
                }
            )
        else:
            status = f"rows-only ({len(s_rows)} rows)"
            rec.update({"oracle": False, "pass": len(s_rows) >= 0})
        print(f"  {name:32s} {status:20s} {len(s_rows):>7} rows {time.time()-t0:5.1f}s")
        if "MISMATCH" in status:
            fails.append(name)
        records[name] = rec
    except Exception as e:  # noqa: BLE001
        print(f"  {name:32s} ERROR {type(e).__name__}: {str(e)[:120]}")
        fails.append(name)
        records[name] = {"pass": False, "error": f"{type(e).__name__}: {str(e)[:200]}"}

print("RESULT:", "FAIL " + ",".join(fails) if fails else "ALL MATCH")
if json_out:
    n_pass = sum(1 for r in records.values() if r.get("pass"))
    Path(json_out).write_text(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(records),
                "n_oracle_checked": sum(1 for r in records.values() if r.get("oracle")),
                "n_pass": n_pass,
                "n_fail": len(records) - n_pass,
                "queries": records,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {json_out}: {n_pass}/{len(records)} pass")
spark.stop()
sys.exit(1 if fails else 0)
