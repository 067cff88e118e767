"""Interleaved same-session A/B (VERDICT r11 item 1 methodology): flip
an env knob between two values and time the SAME queries to the noop
sink alternating A,B,A,B,... inside ONE session, so ambient box drift
hits both arms equally. Cross-session comparisons on this box carry
±50% per-query variance (diagnosed r11); interleaving is the only
trustworthy readout at that magnitude.

Usage:
  python scripts/ab_interleaved.py SF_DIR KNOB VAL_A VAL_B PASSES q1 [q2 ...]

Prints one JSON line:
  {"knob": ..., "queries": {name: {"a": [...], "b": [...],
   "a_min": .., "b_min": .., "a_med": .., "b_med": ..}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streams_prototyping_spark import registry
from streams_prototyping_spark.session import get_spark


def main() -> None:
    sf_dir, knob, val_a, val_b, passes, *names = sys.argv[1:]
    passes = int(passes)
    spark = get_spark("ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    def run(name: str, val: str) -> float:
        os.environ[knob] = val
        spark.sparkContext.setJobDescription(f"{name}@{knob}={val}")
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for name in names:
        run(name, val_a)  # warm both arms (stages, codegen) untimed
        run(name, val_b)
        a: list[float] = []
        b: list[float] = []
        for _ in range(passes):
            a.append(run(name, val_a))
            b.append(run(name, val_b))
        out[name] = {
            "a": a,
            "b": b,
            "a_min": min(a),
            "b_min": min(b),
            "a_med": round(statistics.median(a), 3),
            "b_med": round(statistics.median(b), 3),
        }
    from streams_prototyping_spark.stage_cache import release_all

    release_all()
    print(
        json.dumps(
            {"sf_dir": sf_dir, "knob": knob, "val_a": val_a, "val_b": val_b,
             "passes": passes, "queries": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
