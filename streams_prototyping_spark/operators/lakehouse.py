"""Lakehouse / warehouse-maintenance operators: the table-management
queries a 100 TB deployment runs around the analytics themselves.

The reference repo materializes KTables to Kafka topics; a lakehouse
deployment of the same pipelines maintains *tables* — dimensions with
history (SCD Type 2), current-state snapshots derived from changelogs
(the batch twin of MERGE INTO), physical layout for data skipping
(z-order), and the sliding distinct-count rollups dashboards read.
Each is expressed as pure DataFrame ops with a DuckDB oracle.

Scale design (100 TB):
- SCD2 and the changelog apply are one keyed window each over data
  already aggregated to O(entity-days) / O(entities) — the raw event
  scan partial-aggregates before any shuffle.
- The z-order pass is the *layout planner*: it computes the
  interleaved-bit cell for every row with pure integer arithmetic
  (no shuffle at all beyond the final tiny per-cell rollup); a real
  deployment follows it with write.partitionBy/sortWithinPartitions
  on the cell to get min/max-skippable files.
- Sliding distinct expands each (user, day) to the <=7 trailing
  window days it serves (explode of a 7-element sequence) and then
  aggregates — a bounded fan-out keyed shuffle instead of a range
  self-join, which is the shape that survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

DAY = 86400

# ------------------------------------------------------------- SCD2

TIER_MID = 80.0    # daily spend thresholds (exact decimal-sum compares)
TIER_HIGH = 200.0

_TIER_CASE = (
    f"CASE WHEN daily_spend >= {TIER_HIGH} THEN 'high' "
    f"WHEN daily_spend >= {TIER_MID} THEN 'mid' ELSE 'low' END"
)

_SCD2_ORACLE = f"""
WITH daily AS (
    SELECT user_id,
           CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_spend
    FROM events GROUP BY 1, 2
), tiers AS (
    SELECT user_id, day_epoch, {_TIER_CASE} AS tier,
           lag({_TIER_CASE}) OVER (PARTITION BY user_id ORDER BY day_epoch)
               AS prev_tier
    FROM daily
), changes AS (
    SELECT user_id, day_epoch AS valid_from, tier
    FROM tiers WHERE prev_tier IS NULL OR tier <> prev_tier
)
SELECT user_id, tier, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from)
           AS BIGINT) AS version,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           IS NULL) AS is_current
FROM changes
"""


@register("scd2_user_tier", oracle=_SCD2_ORACLE)
def scd2_user_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: per-user spend tier with
    [valid_from, valid_to) validity intervals, derived from the daily
    event history. Consecutive same-tier days collapse into one
    version (gaps-and-islands); the open interval (valid_to IS NULL)
    is the current row.

    Determinism: tier compares an exact decimal daily sum against
    constant thresholds, so both engines pick identical tiers; day
    epochs are unique per user, so lag/lead orderings are total.

    Scale note: the only corpus-sized work is the partial-aggregated
    groupBy(user, day); the SCD windows run over O(user-days) rows.
    A lakehouse deployment MERGEs `changes` into the dimension table
    instead of rebuilding — same change-point frame either way.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("daily_spend")
    )
    tier = F.expr(_TIER_CASE)
    w = Window.partitionBy("user_id").orderBy("day_epoch")
    tiers = daily.select(
        "user_id", "day_epoch", tier.alias("tier"), F.lag(tier).over(w).alias("prev_tier")
    )
    changes = tiers.filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    ).select("user_id", F.col("day_epoch").alias("valid_from"), "tier")
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(wv)
    return changes.select(
        "user_id",
        "tier",
        "valid_from",
        valid_to.alias("valid_to"),
        F.row_number().over(wv).cast("long").alias("version"),
        valid_to.isNull().alias("is_current"),
    )


# ------------------------------------------------- CDC changelog apply

# event_type -> changelog op: the batch twin of MERGE INTO semantics.
_OP_CASE = (
    "CASE WHEN event_type = 'signup' THEN 'insert' "
    "WHEN event_type = 'purchase' THEN 'delete' ELSE 'update' END"
)

_CDC_ORACLE = f"""
WITH log AS (
    SELECT user_id, event_id, value, {_OP_CASE} AS op,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
    FROM events
), ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY ts_epoch DESC, event_id DESC
           ) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_ops
    FROM log
)
SELECT user_id, value AS current_value, op AS last_op, ts_epoch AS last_ts,
       n_ops
FROM ranked
WHERE rn = 1 AND op <> 'delete'
"""


@register("cdc_apply_changelog", oracle=_CDC_ORACLE)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog application: collapse an insert/update/delete event
    stream into the current-state snapshot (last-writer-wins per key;
    a trailing delete removes the key). This is the batch semantics of
    `MERGE INTO target USING changes` — the operation every CDC
    ingestion pipeline runs.

    Determinism: (ts, event_id) is a total order per user, so the
    last-writer pick is unique.

    Scale note: one window over the keyed changelog. In steady state
    only the delta partition is re-ranked (the dedup_incremental
    pattern); the full-history rebuild here is the bootstrap path.
    At 100 TB the changelog is date-partitioned and the snapshot is
    bucketed by key, making the apply a co-located merge.
    """
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "value",
        F.expr(_OP_CASE).alias("op"),
        F.unix_timestamp("ts").alias("ts_epoch"),
    )
    wk = Window.partitionBy("user_id")
    ranked = log.select(
        "*",
        F.row_number()
        .over(wk.orderBy(F.col("ts_epoch").desc(), F.col("event_id").desc()))
        .alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n_ops"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("op") != "delete")).select(
        "user_id",
        F.col("value").alias("current_value"),
        F.col("op").alias("last_op"),
        F.col("ts_epoch").alias("last_ts"),
        "n_ops",
    )


# ------------------------------------------------------ z-order layout

ZBITS = 8  # 8 bits per dimension -> 16-bit z-value, 256 cells of 256


def _interleave_expr(x: str, y: str) -> str:
    """Morton interleave of two {ZBITS}-bit ints — same text is valid
    Spark SQL and DuckDB SQL (&, <<, >> are common syntax)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


# x: custkey scaled to 0..255 over its [min,max] range; y: day index
# scaled likewise. All-integer arithmetic -> bit-identical engines.
_Z_PREP_DUCK = """
WITH bounds AS (
    SELECT min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
           CAST(floor(epoch(date_trunc('day', min(o_orderdate)))) AS BIGINT) AS d_min,
           CAST(floor(epoch(date_trunc('day', max(o_orderdate)))) AS BIGINT) AS d_max
    FROM orders
), keyed AS (
    SELECT o.o_orderkey, o.o_custkey,
           (CAST(floor(epoch(date_trunc('day', o.o_orderdate))) AS BIGINT) - b.d_min)
               // 86400 AS day_idx,
           ((o.o_custkey - b.ck_min) * 256) // (b.ck_max - b.ck_min + 1) AS zx,
           (((CAST(floor(epoch(date_trunc('day', o.o_orderdate))) AS BIGINT) - b.d_min)
               // 86400) * 256)
               // ((b.d_max - b.d_min) // 86400 + 1) AS zy
    FROM orders o CROSS JOIN bounds b
)
"""

_ZORDER_ORACLE = (
    _Z_PREP_DUCK
    + f"""
SELECT {_interleave_expr('zx', 'zy')} >> {ZBITS} AS cell,
       count(*) AS n_rows,
       min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
       min(day_idx) AS day_lo, max(day_idx) AS day_hi
FROM keyed
GROUP BY 1
"""
)


@register("zorder_cell_stats", oracle=_ZORDER_ORACLE)
def zorder_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) layout planner over orders(custkey, day):
    quantize both dimensions to {ZBITS} bits, interleave, and report
    per-cell row counts and min/max bounding boxes — exactly the
    file-level statistics parquet min/max skipping would see if files
    were written one-per-cell. Tight per-cell (ck, day) spans are the
    point: a predicate on EITHER dimension prunes most cells.

    Scale note: the z-value is pure per-row integer arithmetic against
    one broadcast bounds row — no shuffle until the 256-row cell
    rollup. The actual rewrite at 100 TB is
    `df.repartitionByRange('cell').sortWithinPartitions('cell')`
    feeding the writer; this query is the planning/audit half.
    """
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.unix_timestamp(F.date_trunc("day", F.min("o_orderdate"))).alias("d_min"),
        F.unix_timestamp(F.date_trunc("day", F.max("o_orderdate"))).alias("d_max"),
    )
    keyed = o.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "(unix_timestamp(date_trunc('day', o_orderdate)) - d_min) div 86400"
        ).alias("day_idx"),
        F.expr("((o_custkey - ck_min) * 256) div (ck_max - ck_min + 1)").alias("zx"),
        F.expr(
            "(((unix_timestamp(date_trunc('day', o_orderdate)) - d_min) div 86400)"
            " * 256) div ((d_max - d_min) div 86400 + 1)"
        ).alias("zy"),
    )
    zcell = F.expr(f"{_interleave_expr('zx', 'zy')} >> {ZBITS}")
    return keyed.groupBy(zcell.alias("cell")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("day_idx").alias("day_lo"),
        F.max("day_idx").alias("day_hi"),
    )


# ------------------------------------------- sliding distinct users

SLIDE_DAYS = 7

_SLIDING_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch
    FROM events
), bounds AS (
    SELECT min(day_epoch) AS d_min, max(day_epoch) AS d_max FROM pairs
), contrib AS (
    SELECT p.user_id,
           CAST(unnest(generate_series(p.day_epoch,
                p.day_epoch + {(SLIDE_DAYS - 1) * DAY}, {DAY})) AS BIGINT)
               AS window_day
    FROM pairs p
)
SELECT c.window_day,
       count(DISTINCT c.user_id) AS active_users_7d
FROM contrib c CROSS JOIN bounds b
WHERE c.window_day BETWEEN b.d_min AND b.d_max
GROUP BY 1
"""


@register("sliding_distinct_users", oracle=_SLIDING_ORACLE)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {SLIDE_DAYS}-day distinct active users per day — the
    rolling-DAU/WAU metric. COUNT(DISTINCT) cannot run in a window
    frame; the scalable shape is contribution expansion: each distinct
    (user, day) serves the {SLIDE_DAYS} window-days it falls into
    (a bounded explode), then one keyed distinct-aggregate per
    window day.

    Scale note: fan-out is exactly {SLIDE_DAYS}x the *per-day distinct*
    pairs (already partial-aggregated), not raw events, and replaces
    a range self-join whose reducer keys would each see the whole
    window. The cumulative twin is `cumulative_distinct_users`
    (first-seen trick); the streaming twin is a windowed
    approx_count_distinct with watermark eviction.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch")
    ).distinct()
    bounds = pairs.agg(
        F.min("day_epoch").alias("d_min"), F.max("day_epoch").alias("d_max")
    )
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day_epoch"),
                F.col("day_epoch") + F.lit((SLIDE_DAYS - 1) * DAY),
                F.lit(DAY),
            )
        ).alias("window_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_day").between(F.col("d_min"), F.col("d_max")))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


# --------------------------------------------------- snapshot diff audit

_DIFF_HASH = "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)"


def _diff_version_b_sql() -> str:
    """Version B of orders, derived deterministically from version A:
    ~1% of keys dropped (hash%100 = 0), ~2% price-mutated (+1.00,
    hash%100 in 1..2), ~1% new keys appended (hash%97 = 3, re-keyed by
    +max(o_orderkey) — derived from the data, NOT a constant, so the
    synthetic keys can never collide with real ones at ANY scale
    factor; ADVICE r5: a fixed 1e8 offset would silently collide past
    the sf100 upscale). DuckDB twin of the Spark builder below."""
    h = _DIFF_HASH
    return f"""
    SELECT o_orderkey,
           CASE WHEN {h} % 100 IN (1, 2)
                THEN CAST(round(o_totalprice * 100) + 100 AS BIGINT)
                ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
    FROM orders WHERE {h} % 100 <> 0
    UNION ALL
    SELECT o_orderkey + (SELECT max(o_orderkey) FROM orders) AS o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE {h} % 97 = 3
    """


_TABLE_DIFF_ORACLE = f"""
WITH a AS (
    SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), b AS (
{_diff_version_b_sql()}
), diff AS (
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.cents <> b.cents THEN 'changed'
                ELSE 'unchanged' END AS status,
           coalesce(b.cents, a.cents) AS cents
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)
SELECT status, count(*) AS n_rows, sum(cents) AS total_cents
FROM diff GROUP BY status
"""


@register("table_diff_audit", oracle=_TABLE_DIFF_ORACLE)
def table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation — the lakehouse migration /
    replication audit: diff two table versions on the primary key and
    report added / removed / changed / unchanged row counts with a
    value checksum per class. Version B is synthesized in-query from
    version A by deterministic hash rules (drop ~1%, mutate ~2%,
    append ~1% re-keyed), so the EXPECTED diff composition is known
    and the audit's correctness is oracle-checkable end-to-end.

    Reference parity: the reference has no table-maintenance surface
    (apurvam/streams-prototyping, 408 Java LoC); SURVEY Part C″
    lakehouse extension, next to scd2_user_tier / cdc_apply_changelog.

    Scale note: ONE full-outer equi-join on the key (both sides
    shuffle-partitioned on it — at production scale both snapshots are
    bucketed on the PK and the join is shuffle-free) followed by a
    4-group partial-combined aggregate. Values compare via integer
    cents; no floats anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.select("o_orderkey", cents.alias("cents"))
    b_keep = (
        o.filter(h % 100 != 0)
        .select(
            "o_orderkey",
            F.when((h % 100).isin(1, 2), cents + 100).otherwise(cents).alias("cents"),
        )
    )
    # Offset derived from the data (broadcast 1-row max), mirroring the
    # oracle's scalar subquery: synthetic keys occupy (kmax, 2*kmax]
    # and cannot collide with real keys at any scale factor.
    kmax = o.agg(F.max("o_orderkey").alias("kmax"))
    b_new = (
        o.filter(h % 97 == 3)
        .crossJoin(F.broadcast(kmax))
        .select(
            (F.col("o_orderkey") + F.col("kmax")).alias("o_orderkey"),
            cents.alias("cents"),
        )
    )
    b = b_keep.unionAll(b_new)
    aj = a.alias("a")
    bj = b.alias("b")
    diff = aj.join(
        bj, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    ).select(
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(F.col("a.cents") != F.col("b.cents"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.coalesce(F.col("b.cents"), F.col("a.cents")).alias("cents"),
    )
    return diff.groupBy("status").agg(
        F.count("*").alias("n_rows"), F.sum("cents").alias("total_cents")
    )
