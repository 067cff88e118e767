"""Time individual registered queries in isolation (guide §1.4): same
methodology as bench.py — warm-up pass (codegen/JIT, caches, shared
stages) then a timed pass to the noop sink — but over an explicit
query list, so a single operator can be measured without paying the
full 176-query headline run while iterating.

Usage: python scripts/time_queries.py [sf_dir] q1 q2 ...  [--passes N]

Prints one JSON line {"sf_dir":..., "queries": {name: sec}} (timed
pass; with --passes N > 1, the per-query MIN across the N timed
passes — the steady-state number, least contaminated by GC or
page-cache noise).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streams_prototyping_spark import registry
from streams_prototyping_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    passes = 1
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir = args[0]
        args = args[1:]
    names = args
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in names:  # warm-up
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, 1e9), dt)
    from streams_prototyping_spark.stage_cache import release_all

    release_all()
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "queries": best}))
    spark.stop()


if __name__ == "__main__":
    main()
