"""Dump a one-line plan-facts summary for every registered query (and
optionally the full formatted plan with --full). The reviewer-facing
artifact of the 'explain the plan and iterate' loop.

Usage: python scripts/dump_plans.py [sf_dir] [--full]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streams_prototyping_spark import registry
from streams_prototyping_spark.plans.introspect import explain_str, plan_facts
from streams_prototyping_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    full = "--full" in sys.argv

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name, fn in sorted(registry.QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            print(f"{name:36s} {plan_facts(df).summary}")
            if full:
                print(explain_str(df))
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {type(e).__name__}: {str(e)[:80]}")
    spark.stop()


if __name__ == "__main__":
    main()
