"""Generate an sf10 dataset (100x sf0.1, ~60M lineitem rows) by
chaining the key-shifted upscale twice: sf0.1 -> sf1 (make_sf1.py,
10 replicas) -> sf10 (10 replicas of sf1). Chaining keeps the
construction's measurement-validity argument intact at each step:
per-key cardinalities, join selectivities, and group sizes match the
source decade, so fitted scaling exponents mean what they claim.

Output: $SPARK_GRAFT_SF10_DIR (default /tmp/spark_graft_sf10),
~2-3 GB of parquet. Deterministic, idempotent (marker file).

Usage: python scripts/make_sf10.py [--force]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from scripts.make_sf1 import SHIFT, COPY_ONLY, build  # noqa: E402


def sf10_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")


def build_sf10(spark: SparkSession, force: bool = False) -> str:
    sf1 = build(spark, force=False)  # ensure the sf1 decade exists
    return build(
        spark,
        out_dir=sf10_dir(),
        force=force,
        src_dir=sf1,
        replicas=10,
        marker_name="_SUCCESS_SF10",
    )


def main() -> None:
    from streams_prototyping_spark.session import get_spark

    spark = get_spark("make-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    out = build_sf10(spark, force="--force" in sys.argv)
    for t in list(SHIFT) + COPY_ONLY:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n:,}")
    spark.stop()


if __name__ == "__main__":
    main()
