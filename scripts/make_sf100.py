"""Generate an sf100 dataset (1000x sf0.1, ~600M lineitem rows /
~1.5M documents) by chaining the key-shifted upscale a third time:
sf0.1 -> sf1 -> sf10 -> sf100 (10 replicas of sf10). The chained
construction keeps the measurement-validity argument at each decade
(per-key cardinalities, join selectivities, group sizes match the
source decade — see make_sf1.py), so fourth-decade fitted exponents
mean what they claim.

Output: $SPARK_GRAFT_SF100_DIR (default /tmp/spark_graft_sf100),
~18-20 GB of parquet (64 partitions per fact table so a single file
stays ~200-300 MB). Deterministic, idempotent (marker file).
Build takes a few minutes; requires ~25 GB free on the output volume.

Usage: python scripts/make_sf100.py [--force]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from scripts.make_sf1 import SHIFT, COPY_ONLY, build  # noqa: E402
from scripts.make_sf10 import build_sf10  # noqa: E402


def sf100_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/spark_graft_sf100")


def build_sf100(spark: SparkSession, force: bool = False) -> str:
    sf10 = build_sf10(spark, force=False)  # ensure the sf10 decade exists
    return build(
        spark,
        out_dir=sf100_dir(),
        force=force,
        src_dir=sf10,
        replicas=10,
        marker_name="_SUCCESS_SF100",
        partitions=64,
    )


def main() -> None:
    from streams_prototyping_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("make-sf100")
    spark.sparkContext.setLogLevel("ERROR")
    out = build_sf100(spark, force="--force" in sys.argv)
    for t in list(SHIFT) + COPY_ONLY:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n:,}")
    spark.stop()


if __name__ == "__main__":
    main()
