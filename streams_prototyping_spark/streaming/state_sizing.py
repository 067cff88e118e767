"""State-partition sizing for stateful streaming queries.

The round-5 A/B (scripts/join_throughput_ab.py, table in BASELINE.md)
proved the stream-stream join was state-COMMIT-bound, not
state-op-bound: every micro-batch commits EVERY partition's state
store (snapshot/delta write + fsync), so per-batch overhead scales
with the partition count while per-row work does not. 8 state
partitions sustained ~268k rows/s where 32 (the core count — the
default everyone picks) managed ~142k.

This module turns that recorded production rule into code: pick
``spark.sql.shuffle.partitions`` for a stateful query from the
ESTIMATED STATE VOLUME, not from the core count.

The sizing rule
---------------
    partitions = clamp(ceil(state_bytes / target_partition_bytes),
                       min_partitions, max_partitions)

- ``state_bytes`` = estimated resident state rows x row width. For a
  watermarked aggregate, rows ~ open windows x keys; for a
  stream-stream join, rows ~ (watermark + join window) seconds x input
  rows/second summed over both sides (symmetric-hash keeps both).
- ``target_partition_bytes`` (default 256 MiB): err LOW on partition
  count. The round-6 --tuned measurement showed the commit-cost curve
  is much steeper than a naive bytes-per-partition model — at ~2M
  resident rows, 16 partitions measured 140k rows/s (per-batch commit
  12.4s summed) vs 8 partitions at 221k (2.7s): halving partitions
  quartered commit cost. 256 MiB per partition is comfortably inside
  both providers' per-store capacity and keeps the count minimal.
- ``min_partitions`` (default 8) is the parallelism floor: state
  insert/probe is CPU work that still wants several cores even when
  the state is tiny (the A/B's winning cell).

CAVEAT (fixed-at-first-checkpoint): Spark pins the state partition
count at the FIRST checkpoint of a query; changing
``spark.sql.shuffle.partitions`` later does nothing for an existing
checkpoint. Call :func:`configure_stateful_shuffle` BEFORE
``writeStream.start()`` on a fresh checkpoint, and treat the choice as
part of the checkpoint's identity. AQE never re-plans stateful
exchanges, so this knob is the only control there is.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

TARGET_PARTITION_BYTES = 256 << 20  # 256 MiB of state per partition
MIN_PARTITIONS = 8
MAX_PARTITIONS = 512


def estimate_join_state_rows(
    rows_per_second: float,
    watermark_seconds: float,
    join_window_seconds: float = 0.0,
    n_sides: int = 2,
) -> int:
    """Resident state rows for a watermarked stateful query.

    Each side of a stream-stream join buffers (watermark + join
    window) seconds of input; a windowed aggregate keeps one row per
    open (window x key), which the same horizon x rate bound covers
    conservatively. ``rows_per_second`` is the PER-SIDE input rate.
    """
    horizon = watermark_seconds + join_window_seconds
    return int(math.ceil(rows_per_second * horizon * n_sides))


def recommended_state_partitions(
    est_state_rows: int,
    row_width_bytes: int = 64,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    min_partitions: int = MIN_PARTITIONS,
    max_partitions: int = MAX_PARTITIONS,
) -> int:
    """Partition count such that each partition holds ~target bytes of
    state — the A/B-derived rule (commit overhead scales with
    partitions; memory/skew pressure bounds partition size from the
    other side)."""
    state_bytes = max(0, est_state_rows) * row_width_bytes
    need = math.ceil(state_bytes / target_partition_bytes) if state_bytes else 0
    return max(min_partitions, min(max_partitions, need))


def configure_stateful_shuffle(
    spark: SparkSession,
    est_state_rows: int,
    row_width_bytes: int = 64,
    **kwargs: int,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` for a stateful query about
    to start on a FRESH checkpoint (see module caveat) and return the
    chosen count."""
    n = recommended_state_partitions(est_state_rows, row_width_bytes, **kwargs)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
