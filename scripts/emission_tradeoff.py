"""Measure the A17 emission tradeoff (SURVEY §4.3): per-batch update
mode (`ctr_stateful_stream`, one row per key per micro-batch) vs true
per-record changelog emission (`ctr_changelog_stream`, one row per
input record — the reference's cache-disabled behavior,
Aggregations.java:69).

Replays the same synthetic ads_with_clicks stream (N records, K ads,
B micro-batches) through both and prints one JSON line with wall
seconds, input rows/sec, and output row counts. The numbers land in
BASELINE.md §emission.

Usage: python scripts/emission_tradeoff.py [n_records] [n_ads] [n_batches]
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streams_prototyping_spark.session import get_spark
from streams_prototyping_spark.streaming.pipelines import (
    ctr_changelog_stream,
    ctr_stateful_stream,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8

spark = get_spark("emission-tradeoff")
spark.sparkContext.setLogLevel("ERROR")

base = dt.datetime(2024, 1, 1)
schema = "ad_id long, impression_id long, imp_ts timestamp, was_clicked boolean"
work = Path(tempfile.mkdtemp(prefix="emission_"))

# deterministic synthetic stream: impression i -> ad i%K, clicked every
# 7th record, event time advancing 1 s per record
src = spark.range(N).selectExpr(
    f"id % {K} AS ad_id",
    "id AS impression_id",
    f"timestamp'{base}' + make_interval(0,0,0,0,0,0,id) AS imp_ts",
    "id % 7 = 0 AS was_clicked",
)
per_batch = N // B
paths = {}
for mode in ("update", "changelog"):
    p = work / mode
    for b in range(B):
        src.where(
            (src.impression_id >= b * per_batch)
            & (src.impression_id < (b + 1) * per_batch)
        ).coalesce(1).write.mode("append").parquet(str(p))
    paths[mode] = str(p)

results = {}
for mode, pipe in (("update", ctr_stateful_stream), ("changelog", ctr_changelog_stream)):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(paths[mode])
    )
    t0 = time.perf_counter()
    q = (
        pipe(stream)
        .writeStream.format("memory")
        .queryName(f"emission_{mode}")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    sec = time.perf_counter() - t0
    out_rows = spark.table(f"emission_{mode}").count()
    results[mode] = {
        "wall_sec": round(sec, 2),
        "input_rows_per_sec": round(N / sec),
        "output_rows": out_rows,
    }

print(
    json.dumps(
        {"n_records": N, "n_ads": K, "n_batches": B, **results},
    )
)
shutil.rmtree(work, ignore_errors=True)
spark.stop()
