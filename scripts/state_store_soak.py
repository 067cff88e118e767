"""RocksDB-vs-HDFS state store in the LARGE-state regime (VERDICT r5
item 6).

The round-5 A/B showed RocksDB losing at state <<< heap — expected: the
HDFS-backed provider is an on-heap hash map, unbeatable while it fits.
RocksDB's claimed win is state >> heap (off-heap native storage +
changelog checkpointing). That regime is unreachable on the default
128 GiB driver, so this soak DELIBERATELY runs a small-heap session
(SPARK_GRAFT_DRIVER_MEM, default 3g) and grows streaming-dedup state
(wide 512-byte payloads, long watermark, monotone keys so nothing is
ever dropped as duplicate) until the HDFS provider shows heap pressure
— then runs the identical soak on RocksDB and reports where the
crossover sits.

Per provider it records a time series of (state rows, state bytes,
batch duration, GC time) from StreamingQueryProgress, and the sustained
rate over the LAST quarter of the soak — the figure that degrades first
when memory pressure sets in.

Usage: python scripts/state_store_soak.py [--secs=150] [--rate=400000]
                                          [--payload=512] [--heap=3g]
Prints one JSON line per provider + a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SECS = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--secs=")), "150"))
RATE = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--rate=")), "400000"))
PAYLOAD = int(next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--payload=")), "512"))
HEAP = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--heap=")), "3g")

os.environ["SPARK_GRAFT_DRIVER_MEM"] = HEAP

from pyspark.sql import functions as F  # noqa: E402

from streams_prototyping_spark.session import get_spark  # noqa: E402

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def soak(spark, provider: str, changelog: bool) -> dict:
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    if changelog:
        # RocksDB changelog checkpointing: per-batch commit uploads the
        # delta, snapshots happen in the background maintenance thread
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", RATE)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("k"),  # monotone: every key unique, state only grows
            F.repeat(F.lit("x"), PAYLOAD).alias("payload"),
        )
        .withWatermark("ts", "30 minutes")  # horizon >> soak length: state never evicts
    )
    out = src.dropDuplicates(["k", "payload"])
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    t0 = time.time()
    series = []
    err = None
    try:
        while time.time() - t0 < SECS:
            time.sleep(2.0)
            lp = q.lastProgress
            if not lp:
                continue
            p = json.loads(lp.json) if hasattr(lp, "json") else lp
            ops = p.get("stateOperators") or []
            if not ops or p.get("numInputRows", 0) == 0:
                continue
            series.append(
                {
                    "t": round(time.time() - t0, 1),
                    "rows": sum(o.get("numRowsTotal", 0) for o in ops),
                    "state_mb": round(
                        sum(o.get("memoryUsedBytes", 0) for o in ops) / 2**20, 1
                    ),
                    "commit_ms": sum(o.get("commitTimeMs", 0) for o in ops),
                    "batch_s": round(p.get("batchDuration", 0) / 1000, 2),
                    "rps": round(p.get("processedRowsPerSecond", 0)),
                }
            )
    except Exception as e:  # heap exhaustion is a RESULT here, not a bug
        err = f"{type(e).__name__}: {str(e)[:200]}"
    finally:
        try:
            q.stop()
        except Exception:
            pass
    # de-dup consecutive identical batch snapshots (lastProgress repeats)
    dedup = []
    for s in series:
        if not dedup or s["rows"] != dedup[-1]["rows"]:
            dedup.append(s)
    tail = dedup[3 * len(dedup) // 4 :] or dedup
    rec = {
        "provider": ("rocksdb+changelog" if changelog else "rocksdb")
        if provider == ROCKSDB
        else "hdfs",
        "heap": HEAP,
        "payload_bytes": PAYLOAD,
        "final_state_rows": dedup[-1]["rows"] if dedup else 0,
        "final_state_mb": dedup[-1]["state_mb"] if dedup else 0,
        "tail_sustained_rps": round(
            sorted(s["rps"] for s in tail)[len(tail) // 2]
        )
        if tail
        else 0,
        "tail_batch_s": round(
            sorted(s["batch_s"] for s in tail)[len(tail) // 2], 2
        )
        if tail
        else 0,
        "series": dedup[:: max(1, len(dedup) // 12)],
        **({"error": err} if err else {}),
    }
    print(json.dumps(rec), flush=True)
    return rec


def _run_one_cell(cell: str) -> None:
    provider, changelog = {
        "hdfs": (HDFS, False),
        "rocksdb": (ROCKSDB, False),
        "rocksdb-changelog": (ROCKSDB, True),
    }[cell]
    spark = get_spark("state-soak")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        soak(spark, provider, changelog)
    finally:
        try:
            spark.stop()
        except Exception:
            pass


def main() -> None:
    cell = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--cell=")), None)
    if cell:
        _run_one_cell(cell)
        return
    # One SUBPROCESS per cell: the HDFS cell is EXPECTED to kill its
    # JVM with heap exhaustion (that is the measurement), which also
    # kills the py4j gateway of the hosting python process — so each
    # cell gets its own interpreter.
    import subprocess

    cells = []
    for c in ("hdfs", "rocksdb", "rocksdb-changelog"):
        try:
            out = subprocess.run(
                [sys.executable, __file__, f"--cell={c}"]
                + [a for a in sys.argv[1:] if a.startswith("--")],
                capture_output=True,
                text=True,
                timeout=SECS + 240,
            )
        except subprocess.TimeoutExpired as e:
            # a hung cell (e.g. a JVM wedged in GC-death rather than
            # dying cleanly) is itself a measurement: record it and let
            # the remaining provider cells + summary table run (ADVICE r6)
            tail = (e.stderr or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            cells.append({"provider": c, "error": f"cell hung > {SECS + 240}s",
                          "stderr_tail": tail[-300:]})
            print(json.dumps(cells[-1]), flush=True)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                cells.append(rec)
                print(json.dumps(rec), flush=True)
                break
        else:
            cells.append({"provider": c, "error": "cell produced no record",
                          "stderr_tail": out.stderr[-300:]})
    print("\n| provider | final state rows | final state MB | tail rows/s | tail batch s | outcome |")
    print("|---|---|---|---|---|---|")
    for c in cells:
        print(
            f"| {c['provider']} | {c.get('final_state_rows', 0):,} "
            f"| {c.get('final_state_mb', '-')} "
            f"| {c.get('tail_sustained_rps', 0):,} | {c.get('tail_batch_s', '-')} "
            f"| {c.get('error', 'completed')} |"
        )
    print(json.dumps({"metric": "state_store_soak", "cells": cells}))


if __name__ == "__main__":
    main()
