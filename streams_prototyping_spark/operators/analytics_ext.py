"""Coverage extensions: GROUPING SETS, robust-statistic aggregates,
gap-based sessionization, and TF-IDF term scoring.

These extend the declarative surface the reference models in its KSQL
comments (Aggregations.java:75-77) along the axes SURVEY §7 Phases 3/5
call for: multi-granularity aggregation, order-statistic aggregates,
the batch twin of session windows, and a text-scoring pipeline for the
LLM-data north star.

Determinism notes follow tests/oracle_check.py: exact DECIMAL money
sums; epoch seconds via unix_timestamp (UTC); double-valued scores
rounded before they are used as sort keys, with a textual tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.operators.tpch_ext import _register_views
from streams_prototyping_spark.registry import register

# ------------------------------------------------------- GROUPING SETS

_GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_agg", oracle=_GROUPING_SETS_SQL)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING() indicators — the general form of
    which rollup_agg / cube_agg are the fixed specializations. The
    ANSI text runs verbatim on both engines; GROUPING() disambiguates
    a genuine NULL key from a superaggregate row.

    Scale note: Spark plans grouping sets as a single Expand + one
    hash aggregate — one shuffle regardless of how many sets, vs one
    pass per set if written as a UNION ALL.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# ------------------------------------------- median / deterministic mode

_MEDIAN_MODE_ORACLE = """
WITH freq AS (
    SELECT l_returnflag, l_quantity, count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_quantity
), best AS (
    SELECT l_returnflag, l_quantity, cnt,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY cnt DESC, l_quantity ASC) AS rn
    FROM freq
)
SELECT m.l_returnflag,
       CAST(round(m.median_qty, 4) AS DOUBLE) AS median_qty,
       CAST(round(m.median_price, 4) AS DOUBLE) AS median_price,
       b.l_quantity AS mode_qty,
       b.cnt AS mode_count
FROM (
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           median(l_extendedprice) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
) m
JOIN best b ON b.l_returnflag = m.l_returnflag AND b.rn = 1
"""


@register("median_mode_agg", oracle=_MEDIAN_MODE_ORACLE)
def median_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic aggregates: exact median plus a *deterministic*
    mode (most frequent value, smallest value on ties — built as a
    two-level aggregate + row_number rather than the engine's mode(),
    whose tie choice is unspecified and engine-dependent). Medians are
    rounded to 4 dp before comparison: the two engines interpolate the
    even-count midpoint with different but ulp-equivalent formulas.

    Scale note: the frequency table is a partial-aggregatable groupBy;
    the rank-1 pick shuffles only (flag, value, cnt) triples. Exact
    median per group sorts within bounded groups (3 flags) — unbounded
    cardinality would switch to approx_percentiles (sketch path).
    """
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    best = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_returnflag").alias("b_flag"),
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).cast("double").alias("median_qty"),
        F.round(F.median("l_extendedprice"), 4).cast("double").alias("median_price"),
    )
    return med.join(best, med.l_returnflag == best.b_flag).select(
        "l_returnflag", "median_qty", "median_price", "mode_qty", "mode_count"
    )


# ------------------------------------------------- gap-based sessionization

_SESSION_GAP_S = 1800

_SESSIONIZE_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, event_id, ts,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
           lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_epoch
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN prev_epoch IS NULL
                  OR ts_epoch - prev_epoch > {_SESSION_GAP_S}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
), numbered AS (
    SELECT user_id, event_id, ts_epoch,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_epoch, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts_epoch) AS session_start_epoch,
       max(ts_epoch) AS session_end_epoch
FROM numbered
GROUP BY user_id, session_seq
"""


@register("sessionize_events", oracle=_SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of
    user inactivity; session id = running count of session starts —
    the batch twin of events_session_window (streaming session_window
    uses the same gap rule). Epoch-second longs keep the gap
    arithmetic exact across engines.

    Scale note: one shuffle on user_id serves the lag, the running
    sum, AND the final groupBy (same partitioning, Catalyst reuses the
    exchange); per-user state is a sort of that user's events only.
    """
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.lag(F.unix_timestamp("ts")).over(wo).alias("prev_epoch"),
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_epoch").isNull()
            | (F.col("ts_epoch") - F.col("prev_epoch") > _SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("session_seq", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_epoch").alias("session_start_epoch"),
            F.max("ts_epoch").alias("session_end_epoch"),
        )
    )


# --------------------------------------------------------- TF-IDF top-k

_TFIDF_K = 3

_TFIDF_ORACLE = f"""
WITH tokens AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
), tok AS (
    SELECT doc_id, term FROM tokens WHERE term <> ''
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
    SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
    SELECT count(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(round(CAST(tf.tf AS DOUBLE)
                      * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                           / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS DOUBLE)
               AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf
FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term ASC) AS rn
    FROM scored
)
WHERE rn <= {_TFIDF_K}
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic text-scoring
    pipeline (tokenize → term frequency → document frequency → smooth
    idf → per-doc top-k). Scores are rounded to 6 dp *before* ranking
    and ties break on the term, so the top-k set is stable even though
    ln() may differ by an ulp between engines.

    Scale note: tf and the top-k rank share the doc_id shuffle key; df
    is a term-keyed aggregate whose result (the vocabulary) is small
    relative to the corpus and broadcast back — no corpus-sized join
    shuffle. At 100 TB the df table may exceed broadcast size; then it
    becomes a shuffled join on term, still never a cross product.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df").cast("double") + 1.0)
                ),
                6,
            )
            .cast("double")
            .alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# ---------------------------------------------------- LATERAL top-k join

_LATERAL_SQL = """
SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@register("lateral_topk_per_customer", oracle=_LATERAL_SQL)
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — each
    customer's two largest orders, expressed as a per-row dependent
    subquery rather than a window rank-filter (window_topn_per_group
    is the equivalent plan; LATERAL is the declarative surface both
    engines accept verbatim). o_orderkey tie-break makes the LIMIT
    deterministic.

    Scale note: Catalyst decorrelates the lateral into a
    WindowGroupLimit over a custkey-keyed shuffle — identical physical
    plan to the window formulation, so the syntax costs nothing.
    """
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL)


# ------------------------------------------------------------ UNPIVOT

_UNPIVOT_SQL = """
SELECT c_custkey, metric, val
FROM customer
UNPIVOT (val FOR metric IN (c_acctbal, c_nationkey))
"""


@register("unpivot_customer_metrics", oracle=_UNPIVOT_SQL)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long melt), the inverse of pivot_event_counts.
    Both engines coerce the unpivoted columns to their common type
    (double), so the value multiset matches exactly.

    Scale note: unpivot is a narrow Expand (row-local fan-out, no
    shuffle); n_cols× row growth happens after column pruning.
    """
    _register_views(spark, sf_dir, "customer")
    return spark.sql(_UNPIVOT_SQL)


# ------------------------------------------------------------- EWMA

EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH seqs AS (
    SELECT user_id,
           list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS INT) AS n_events,
       round(list_reduce(vals, (acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}), 6)
           AS ewma
FROM seqs
"""


@register("ewma_per_user", oracle=_EWMA_ORACLE)
def ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value per user
    (alpha={EWMA_ALPHA}, seeded with the first observation) — the
    recursive time-series smoother SQL window frames cannot express
    (each output depends on the previous OUTPUT, not previous inputs).

    Computed as a left fold over the time-ordered value array; both
    engines fold left-to-right over the identical (ts, event_id)-sorted
    sequence, so the float result is bit-identical (same additions in
    the same order) and round(…, 6) is belt-and-braces.

    Scale note: one groupBy(user) shuffle carrying (ts-sortable struct,
    value); per-user sequences are bounded by user activity, and the
    fold is O(n) inside codegen. For unbounded per-key history the
    streaming twin keeps ONE state row per user
    (applyInPandasWithState, same recurrence) instead of materializing
    the sequence — the recurrence is the same code either way.
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ts"),
                    F.col("event_id"),
                    F.col("value").cast("double").alias("value"),
                )
            )
        ).alias("rows")
    )
    vals = "transform(rows, r -> r.value)"
    fold = (
        f"aggregate(slice({vals}, 2, size({vals}) - 1), "
        f"CAST(element_at({vals}, 1) AS DOUBLE), "
        f"(acc, x) -> acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA})"
    )
    return seqs.select(
        "user_id",
        F.expr(f"size({vals})").cast("int").alias("n_events"),
        F.round(F.expr(fold), 6).alias("ewma"),
    )


# ------------------------------------------------- robust outliers (MAD)

MAD_SCALE = 0.6745       # consistency constant: MAD ~ sigma for normal data
MAD_Z_THRESHOLD = 3.5    # Iglewicz–Hoaglin modified z-score cutoff

_OUTLIER_ORACLE = f"""
WITH med AS (
    SELECT event_type, round(median(value), 6) AS med
    FROM events GROUP BY event_type
), mad AS (
    SELECT e.event_type, round(median(abs(e.value - m.med)), 6) AS mad
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value,
       round({MAD_SCALE} * (e.value - m.med) / d.mad, 6) AS robust_z,
       (abs({MAD_SCALE} * (e.value - m.med) / d.mad) > {MAD_Z_THRESHOLD})
           AS is_outlier
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
"""


@register("value_outliers_mad", oracle=_OUTLIER_ORACLE)
def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: modified z-score against the
    median/MAD (Iglewicz–Hoaglin), the standard data-quality gate that
    survives the exact outliers it is hunting (mean/stddev do not).
    Nested exact medians: median of |value - group median|.

    Determinism: both medians are rounded to 6 dp BEFORE reuse, so the
    z-scores are products of identical doubles in both engines (the
    round-before-use rule — see REFLECTION).

    Scale note: two tiny partial-aggregated median passes keyed by
    event_type (bounded group count; unbounded would switch to the
    approx_percentile sketch), each joined back via broadcast — the
    event stream is scanned twice and never shuffled.
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return apply_mad_gate(e, mad_thresholds_df(spark, sf_dir)).select(
        "event_id", "event_type", "value", "robust_z", "is_outlier"
    )


def mad_thresholds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type (med, mad) threshold table — trained in batch,
    applied by the batch query above AND the streaming gate
    (streaming/pipelines.outlier_gate_stream): the train-offline /
    score-online split of every production data-quality monitor."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.round(F.median("value"), 6).alias("med"))
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.round(F.median(F.abs(F.col("value") - F.col("med"))), 6).alias("mad"),
        )
    )


def apply_mad_gate(rows: DataFrame, thresholds: DataFrame) -> DataFrame:
    """Row-wise modified z-score against a broadcast threshold table —
    stateless, so it works identically on a batch frame or a stream."""
    z = MAD_SCALE * (F.col("value") - F.col("med")) / F.col("mad")
    return rows.join(F.broadcast(thresholds), "event_type").withColumns(
        {
            "robust_z": F.round(z, 6),
            "is_outlier": F.abs(z) > MAD_Z_THRESHOLD,
        }
    )


# --------------------------------------------------- skew diagnostics

SKEW_TOP_N = 10

_SKEW_ORACLE = f"""
WITH per_key AS (
    SELECT user_id AS key, count(*) AS n_rows FROM events GROUP BY user_id
), tot AS (
    SELECT count(*) AS total, count(DISTINCT user_id) AS n_keys FROM events
)
SELECT key, n_rows, rnk,
       round(CAST(n_rows AS DOUBLE) / tot.total, 6) AS row_share,
       round(CAST(n_rows AS DOUBLE) * tot.n_keys / tot.total, 6) AS skew_factor
FROM (
    SELECT key, n_rows,
           CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS BIGINT) AS rnk
    FROM per_key
) CROSS JOIN tot
WHERE rnk <= {SKEW_TOP_N}
"""


@register("skew_key_report", oracle=_SKEW_ORACLE)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis: the {SKEW_TOP_N} heaviest join/group keys
    with their row share and skew factor (share x key count; 1.0 =
    perfectly uniform). This is the query you run when a stage's
    slowest task is 10x the median — its output decides between
    salting, AQE skew-join thresholds, or a broadcast (see the
    skew-resistant join variants in operators/ctr.py).

    Scale note: one partial-combined groupBy on the key, then a top-N
    over the (already small) per-key counts — TakeOrderedAndProject,
    no global sort; the totals side is a 1-row broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy(F.col("user_id").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    tot = e.agg(
        F.count("*").alias("total"),
        F.countDistinct("user_id").alias("n_keys"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    return (
        per_key.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= SKEW_TOP_N)
        .join(F.broadcast(tot))
        .select(
            "key",
            "n_rows",
            "rnk",
            F.round(F.col("n_rows").cast("double") / F.col("total"), 6).alias(
                "row_share"
            ),
            F.round(
                F.col("n_rows").cast("double") * F.col("n_keys") / F.col("total"), 6
            ).alias("skew_factor"),
        )
    )


# --------------------------------------------------- rank normalization

_QNORM_ORACLE = """
SELECT event_id, event_type, value,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id), 6) AS value_pctl
FROM events
"""


@register("quantile_normalize_values", oracle=_QNORM_ORACLE)
def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based feature normalization: each value mapped to its
    percent rank within its event type (ties broken by event_id so both
    engines agree) — the distribution-free scaling used when features
    feed models that assume [0, 1] inputs.

    Scale note: one shuffle on event_type + per-group sort; group count
    is bounded. For unbounded groups the same column comes from a
    two-pass histogram lookup (the approx_percentiles sketch path).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percent_rank().over(w), 6).alias("value_pctl"),
    )


# ----------------------------------------------------- numeric profiler

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    aggs = ", ".join(
        f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
        f"round(min({c}), 6) AS mn_{c}, round(max({c}), 6) AS mx_{c}, "
        f"round(CAST(sum(CAST(round({c}, 6) AS DECIMAL(28,6))) AS DOUBLE)"
        f" / count({c}), 6) AS mean_{c}"
        for c in _PROFILE_COLS
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n_rows, n_rows - nn_{c} AS n_null, "
        f"nd_{c} AS n_distinct, mn_{c} AS min_value, mx_{c} AS max_value, "
        f"mean_{c} AS mean_value FROM s"
        for c in _PROFILE_COLS
    )
    return f"""
WITH s AS (
    SELECT count(*) AS n_rows, {aggs} FROM lineitem
)
{branches}
"""


@register("numeric_profile", oracle=_profile_oracle())
def numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass numeric column profiler over lineitem (row count,
    nulls, distinct, min/max, decimal-exact mean per column) — the
    data-quality dashboard a pipeline runs on every new snapshot
    before anything downstream trusts it.

    Scale note (r11, guide §2.3): the count/min/max/sum profile is one
    partial-combined pass; each n_distinct is its OWN two-phase
    aggregate over just its column (parquet-pruned scan), crossJoined
    into the 1-row profile so all five subtrees run inside a single
    action, concurrently. The previous form put the four
    count_distincts into the one aggregate, which planned as a 5×
    row Expand carrying every column through one wide-keyed hash
    aggregate — measured 2.2× slower at sf0.1 and shuffling the
    union of all columns' distinct groups through one exchange
    instead of four narrow per-column exchanges.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.round(F.min(c), 6).alias(f"mn_{c}"),
            F.round(F.max(c), 6).alias(f"mx_{c}"),
            F.round(
                F.sum(F.round(F.col(c), 6).cast("decimal(28,6)")).cast("double")
                / F.count(c),
                6,
            ).alias(f"mean_{c}"),
        ]
    s = li.agg(*aggs)
    for c in _PROFILE_COLS:
        s = s.crossJoin(
            F.broadcast(li.select(c).distinct().agg(F.count(c).alias(f"nd_{c}")))
        )
    stack = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}, mean_{c}"
        for c in _PROFILE_COLS
    )
    return s.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_null, n_distinct, min_value, max_value, mean_value)",
    ).select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_value", "max_value", "mean_value",
    )


# ------------------------------------------- referential integrity audit

_RI_ORACLE = """
SELECT 'lineitem->orders' AS relation,
       count(*) AS n_child,
       sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'orders->customer',
       count(*),
       sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'lineitem->supplier',
       count(*),
       sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
"""


@register("referential_integrity_audit", oracle=_RI_ORACLE)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema (lineitem ->
    orders, orders -> customer, lineitem -> supplier) — the
    snapshot-acceptance check that catches partial loads and broken
    upstream joins before any query silently under-counts.

    Scale note: each check is one keyed left join counted with a
    partial-combined aggregate; parent sides small enough broadcast
    (customer/supplier), the orders check shuffles on the join key
    once. A real deployment runs this per ingest partition, making
    each check a partition-local join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")

    def check(child, child_key, parent, parent_key, name):
        joined = child.select(F.col(child_key)).join(
            parent.select(F.col(parent_key)),
            F.col(child_key) == F.col(parent_key),
            "left",
        )
        return joined.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col(parent_key).isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        ).select("relation", "n_child", "n_orphans")

    return (
        check(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(check(o, "o_custkey", F.broadcast(c), "c_custkey", "orders->customer"))
        .unionByName(check(li, "l_suppkey", F.broadcast(s), "s_suppkey", "lineitem->supplier"))
    )


# ------------------------------------------------- bloom filter audit

BF_BITS = 256
BF_K = 3


def _bf_bit_duck(k: int, name: str) -> str:
    return (
        f"CAST('0x' || substr(md5('bf{k}:' || {name}), 1, 15) AS BIGINT) % {BF_BITS}"
    )


def _bf_bit_spark(k: int, name: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat('bf{k}:', {name})), 1, 15), 16, 10) "
        f"AS BIGINT) % {BF_BITS}"
    )


def _bloom_oracle() -> str:
    member_bits = ", ".join(_bf_bit_duck(k, "c_name") for k in range(BF_K))
    return f"""
WITH members AS (
    SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING'
), bloom AS (
    SELECT DISTINCT unnest([{member_bits}]) AS bit FROM members
), probes AS (
    SELECT c_name, (c_mktsegment = 'BUILDING') AS is_member,
           unnest([{member_bits}]) AS bit
    FROM customer
), verdict AS (
    SELECT p.c_name, p.is_member,
           (count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END))
               AS positive
    FROM probes p LEFT JOIN bloom b ON b.bit = p.bit
    GROUP BY p.c_name, p.is_member
)
SELECT count(*) AS n_probes,
       sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS n_members,
       sum(CASE WHEN positive THEN 1 ELSE 0 END) AS n_positive,
       sum(CASE WHEN positive AND NOT is_member THEN 1 ELSE 0 END)
           AS n_false_pos,
       sum(CASE WHEN is_member AND NOT positive THEN 1 ELSE 0 END)
           AS n_false_neg,
       round(CAST(sum(CASE WHEN positive AND NOT is_member THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 6) AS fp_rate
FROM verdict
"""


@register("bloom_filter_audit", oracle=_bloom_oracle())
def bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audited against truth: a {BF_BITS}-bit,
    k={BF_K} filter built over one segment's customer names, probed
    with every name; reports positives, false positives (the rate a
    pipeline sizes m/k against) and false negatives (must be zero —
    the Bloom guarantee, here proven not assumed). Like the CMS audit,
    md5 bucketing makes the sketch bit-identical cross-engine, so a
    probabilistic structure gets an exact oracle.

    Scale note: the filter is O({BF_BITS}) state built by one
    partial-combined distinct — the join-pruning sidecar shape (ship
    the bloom, not the set); probing joins the broadcast bit set and
    partial-combines per probe. False-negative-freedom is structural;
    only the FP rate is data-dependent.
    """
    c = load_table(spark, sf_dir, "customer")
    members = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_name")
    bit_arr = "array(" + ", ".join(
        _bf_bit_spark(k, "c_name") for k in range(BF_K)
    ) + ")"
    bloom = (
        members.select(F.explode(F.expr(bit_arr)).alias("bit")).distinct()
        .select("bit", F.lit(1).alias("hit"))
    )
    probes = c.select(
        "c_name",
        (F.col("c_mktsegment") == "BUILDING").alias("is_member"),
        F.explode(F.expr(bit_arr)).alias("bit"),
    )
    verdict = (
        probes.join(F.broadcast(bloom), "bit", "left")
        .groupBy("c_name", "is_member")
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce(F.col("hit"), F.lit(0)))).alias("positive"))
    )
    pos = F.sum(F.when(F.col("positive"), 1).otherwise(0))
    fp = F.sum(F.when(F.col("positive") & ~F.col("is_member"), 1).otherwise(0))
    return verdict.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        pos.alias("n_positive"),
        fp.alias("n_false_pos"),
        F.sum(F.when(F.col("is_member") & ~F.col("positive"), 1).otherwise(0)).alias(
            "n_false_neg"
        ),
        F.round(
            fp.cast("double")
            / F.sum(F.when(~F.col("is_member"), 1).otherwise(0)),
            6,
        ).alias("fp_rate"),
    )


# --------------------------------------------- bloom-prefilter join

BFJ_K = 3            # hash functions
BFJ_LOAD = 16        # target bits per key (fp/probe ~ 6%, ^3 ~ 2e-4)
BFJ_MIN_EXP = 12     # 4096-bit floor
BFJ_MAX_EXP = 16     # 65536-bit cap: the filter must stay shippable

_BFJ_M_DUCK = (
    f"CAST(pow(2, GREATEST({BFJ_MIN_EXP}, LEAST({BFJ_MAX_EXP}, "
    f"CAST(ceil(log2(count(*) * {BFJ_LOAD}.0)) AS BIGINT)))) AS BIGINT)"
)


def _bfj_bit_duck(k: int, name: str) -> str:
    return (
        f"CAST('0x' || substr(md5('bfj{k}:' || CAST({name} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % (SELECT m FROM mm)"
    )


_BFJ_CACHE: dict = {}


def _bfj_filter(spark, dim, sf_dir: str) -> tuple:
    """(n_keys, m, packed words) — the built Bloom filter, cached per
    sf_dir (the index-build pattern: a deployment builds the filter
    once per dim snapshot and ships the bytes; _lsh_bits precedent).
    The word array packs bit j into words[j // 64] at 1 << (j % 64);
    values are wrapped into signed int64 for the array<long> literal.
    Probing uses element_at + shift — O(1) per probe. (The first cut
    shipped the bitmap as an m/4-char hex STRING probed via substring
    and measured 69 s at sf0.1: UTF8String substring walks bytes from
    the start and the giant literal pushed codegen to the interpreted
    path. The long-word literal + single-scan aggregate runs 2.4 s
    warm at sf0.1.)"""
    from streams_prototyping_spark.data import dataset_cache_key

    cache_key = dataset_cache_key(sf_dir, "orders")
    if cache_key in _BFJ_CACHE:
        return _BFJ_CACHE[cache_key]
    import math

    n_keys = dim.count()
    m = 2 ** max(
        BFJ_MIN_EXP,
        min(BFJ_MAX_EXP, math.ceil(math.log2(n_keys * float(BFJ_LOAD)))),
    )
    bit_arr = "array(" + ", ".join(
        f"CAST(conv(substring(md5(concat('bfj{k}:', CAST(k AS STRING))), "
        f"1, 15), 16, 10) AS BIGINT) % {m}"
        for k in range(BFJ_K)
    ) + ")"
    bits = {
        r.bit
        for r in dim.select(F.explode(F.expr(bit_arr)).alias("bit"))
        .distinct()
        .collect()
    }
    words = [0] * (m // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    _BFJ_CACHE[cache_key] = (n_keys, m, words)
    return _BFJ_CACHE[cache_key]


def _bfj_oracle() -> str:
    from streams_prototyping_spark.operators.common import dsum_sql

    dim_bits = ", ".join(_bfj_bit_duck(k, "k") for k in range(BFJ_K))
    probe_bits = ", ".join(_bfj_bit_duck(k, "fk") for k in range(BFJ_K))
    rev = dsum_sql("l_extendedprice") .replace(
        "CAST(l_extendedprice AS DECIMAL(18,2))",
        "CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))",
    )
    return f"""
WITH dim AS (
    SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
), mm AS (SELECT {_BFJ_M_DUCK} AS m FROM dim),
bloom AS (
    SELECT DISTINCT unnest([{dim_bits}]) AS bit FROM dim
), fkeys AS (
    SELECT DISTINCT l_orderkey AS fk FROM lineitem
), probes AS (
    SELECT fk, unnest([{probe_bits}]) AS bit FROM fkeys
), pass AS (
    SELECT p.fk FROM probes p LEFT JOIN bloom b ON b.bit = p.bit
    GROUP BY p.fk
    HAVING count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
), joined AS (
    SELECT l_extendedprice, l_discount
    FROM lineitem JOIN dim ON l_orderkey = dim.k
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dim) AS n_dim_keys,
       (SELECT CAST(m AS BIGINT) FROM mm) AS bloom_bits,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_fact,
       (SELECT CAST(count(*) AS BIGINT)
        FROM lineitem JOIN pass ON l_orderkey = pass.fk) AS n_prefiltered,
       (SELECT CAST(count(*) AS BIGINT) FROM joined) AS n_join,
       round(1.0 - (SELECT CAST(count(*) AS DOUBLE)
                    FROM lineitem JOIN pass ON l_orderkey = pass.fk)
                 / (SELECT count(*) FROM lineitem), 6) AS pruned_frac,
       (SELECT {rev} FROM joined) AS revenue
"""


@register("bloom_prefilter_join", oracle=_bfj_oracle())
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shuffle-reduction pattern: before joining the big
    fact (lineitem) to a FILTERED dim (urgent orders), ship a Bloom
    filter of the dim's join keys to every fact task and drop
    non-matching rows MAP-SIDE — the fact never shuffles rows that
    cannot join (what Spark's runtime bloom-filter join does with
    xxhash64; here built with the md5 bloom of bloom_filter_audit so
    the whole thing stays bit-identical cross-engine and gets an exact
    oracle).

    The filter is a bitmap LITERAL baked into the plan (m/4 hex
    chars): membership is a pure codegen expression per fact row —
    no join, no shuffle, no Python. m adapts to the key count
    (clamp(2^ceil(log2({BFJ_LOAD} n)), 2^{BFJ_MIN_EXP},
    2^{BFJ_MAX_EXP}), same formula in the oracle); the cap is the
    shippable-filter contract — beyond it the fp rate degrades
    gracefully and a deployment would switch to Spark's native
    bloom_filter_agg byte-array merge. Output proves the contract:
    n_join rows and exact revenue equal the plain join's (no false
    negatives), pruned_frac reports what never shuffled.

    Scale note: building the filter aggregates <= m distinct bits
    (bounded by the FILTER size, not the data); the driver collect is
    that bit set — the shipped artifact. The fact side is one scan
    with a codegen'd filter; only surviving rows reach the
    broadcast-hash join.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )
    n_keys, m, words = _bfj_filter(spark, dim, sf_dir)

    def bit_expr(k: int, name: str) -> str:
        return (
            f"CAST(conv(substring(md5(concat('bfj{k}:', CAST({name} AS STRING))), "
            f"1, 15), 16, 10) AS BIGINT) % {m}"
        )

    # r12 (data.widen contract, the poisson_bootstrap_ci fix): the
    # fact file scans as ~1 split at driver SFs, serializing the
    # BFJ_K-md5 probe chain (2.4M md5 at sf0.1) onto one core; widen
    # spreads raw rows once before the probes. At production volumes
    # the scan is naturally wide and this is a cheap row-pass.
    from streams_prototyping_spark.data import widen

    li = widen(li)
    # ONE scan of the fact: probe the bloom per row (map-side), left
    # broadcast-join the dim, and fold every audit metric in a single
    # partial-combined aggregate (no false negatives => true matches
    # are a subset of passed rows, so matched == k IS NOT NULL)
    probed = li.withColumns(
        {
            "_bm": F.lit(words),
            **{
                f"_b{k}": F.expr(bit_expr(k, "l_orderkey"))
                for k in range(BFJ_K)
            },
        }
    )
    cond = " AND ".join(
        f"(shiftright(element_at(_bm, CAST(_b{k} / 64 AS INT) + 1), "
        f"CAST(_b{k} % 64 AS INT)) & 1) = 1"
        for k in range(BFJ_K)
    )
    enriched = probed.withColumn("_pass", F.expr(cond)).join(
        F.broadcast(dim), probed.l_orderkey == dim.k, "left"
    )
    one = F.lit(1).cast("decimal(18,2)")
    matched = F.col("_pass") & F.col("k").isNotNull()
    agg = enriched.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(F.col("_pass"), 1).otherwise(0)).alias("n_prefiltered"),
        F.sum(F.when(matched, 1).otherwise(0)).alias("n_join"),
        F.sum(
            F.when(
                matched,
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(18,2)")),
            )
        )
        .cast("double")
        .alias("revenue"),
    )
    return agg.select(
        F.lit(n_keys).cast("long").alias("n_dim_keys"),
        F.lit(m).cast("long").alias("bloom_bits"),
        F.col("n_fact").cast("long"),
        F.col("n_prefiltered").cast("long"),
        F.col("n_join").cast("long"),
        F.round(
            F.lit(1.0) - F.col("n_prefiltered").cast("double") / F.col("n_fact"),
            6,
        ).alias("pruned_frac"),
        "revenue",
    )
