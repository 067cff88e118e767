"""Advanced relational surface: statistical aggregates, TPC-H-style
multi-join analytics, ordered/argmin aggregation, null-aware anti
joins, collection functions over semi-structured props.

Statistical aggregates are computed from EXACT decimal power sums
(sum x, sum x^2, sum xy — 2-dp inputs make x^2/xy exact at 4 dp) with
the closed-form final expression evaluated in double: deterministic
across engines AND across partition orders, unlike the engines' native
stddev/corr implementations (Welford vs naive, different merge
orders). Same single-shuffle plan shape as any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.operators.common import dsum_sql
from streams_prototyping_spark.registry import register

# ------------------------------------------------------- statistical aggs

_STDDEV_ORACLE = f"""
WITH s AS (
    SELECT l_returnflag,
           count(*) AS n,
           {dsum_sql('l_quantity')} AS sx,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sx / n, 6) AS mean_qty,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty
FROM s
"""


@register("stddev_variance", oracle=_STDDEV_ORACLE)
def stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance per group via exact power sums."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_quantity").cast("decimal(18,2)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return g.select(
        "l_returnflag",
        "n",
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(var, 6).alias("var_qty"),
    )


_CORR_ORACLE = """
WITH s AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
    FROM lineitem
)
SELECT n,
       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       round((n * sxy - sx * sy) / n / n, 6) AS covar_qty_price
FROM s
"""


@register("corr_covar", oracle=_CORR_ORACLE)
def corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of quantity vs
    price, from exact cross sums (one global aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,2)")
    dy = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "n",
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((n * sxy - sx * sy) / n / n, 6).alias("covar_qty_price"),
    )


_PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders GROUP BY o_orderpriority
"""


@register("percentiles_exact", oracle=_PERCENTILE_ORACLE)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: linear interpolation on the sorted set).

    Scale note: exact percentile sorts each group's values — fine for
    bounded groups; an unbounded-cardinality version should switch to
    approx_percentile (t-digest sketch, mergeable map-side).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99"),
    )


_ARGMIN_ORACLE = """
SELECT o_custkey,
       arg_min(o_orderstatus, o_orderkey) AS first_status,
       arg_max(o_totalprice, o_orderkey) AS last_price,
       bool_or(o_orderstatus = 'F') AS any_finished,
       bool_and(o_totalprice > 0) AS all_positive
FROM orders GROUP BY o_custkey
"""


@register("argmin_bool_aggs", oracle=_ARGMIN_ORACLE)
def argmin_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin over the UNIQUE o_orderkey, so ties are
    impossible) and boolean aggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


_LISTAGG_ORACLE = """
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_distinct_csv
FROM nation GROUP BY n_regionkey
"""


@register("listagg_sorted", oracle=_LISTAGG_ORACLE)
def listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect -> sort -> join): collection
    aggregation made deterministic by explicit sorting — collect_list
    order is partition-dependent and NEVER comparable unsorted."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias(
            "nations_distinct_csv"
        ),
    )


# ------------------------------------------------------------ TPC-H shapes

_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-side filters + single
    global sum. The whole query is scan + filter + 2-phase agg; every
    predicate reaches the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_epoch,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> 3-way join -> grouped
    revenue -> top-10.

    Scale note: customer(filtered) joins orders first (smaller build
    side; AQE converts to broadcast when it fits), lineitem joins on
    the already-reduced orders; final TakeOrdered avoids a global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a region filter and the
    customer-nation = supplier-nation locality condition.

    Scale note: nation/region broadcast; the c_nationkey = s_nationkey
    equality becomes part of the join keys, so Catalyst keys the big
    shuffles on (custkey), (orderkey) only — the canonical star-join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


# -------------------------------------------------- null-aware anti, lateral

_NOT_IN_ORACLE = """
SELECT c_custkey, c_nationkey
FROM customer
WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier)
"""


@register("not_in_null_aware", oracle=_NOT_IN_ORACLE)
def not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) — null-aware anti join, the subtle cousin of
    NOT EXISTS (one NULL in the subquery empties the result). Expressed
    in SQL so Catalyst plans the null-aware variant."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_NOT_IN_ORACLE)


_CORRELATED_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
    SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


@register("correlated_scalar_subquery", oracle=_CORRELATED_ORACLE)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders more than twice their
    customer's average. Catalyst decorrelates into an aggregate+join —
    no per-row subquery execution (the float avg threshold is safe for
    the same reason as subquery_scalar).

    Scale note: decorrelation IS the scale story — a naive engine
    re-runs the subquery per row; Catalyst's RewriteCorrelatedScalarSubquery
    turns it into one aggregate and one join.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_ORACLE)


_CROSS_ORACLE = """
SELECT r.r_name, p.o_orderpriority, count(*) AS n
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
GROUP BY r.r_name, p.o_orderpriority
"""


@register("cross_join_small", oracle=_CROSS_ORACLE)
def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian of two SMALL inputs (5 regions x 5
    priorities) — the only acceptable cross join shape; anything
    large-side is a plan bug (see test_plans.py)."""
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return (
        r.crossJoin(p)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------- semi-structured ops

_MAP_ORACLE = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL AS has_k
FROM events
"""


@register("props_map_functions", oracle=_MAP_ORACLE)
def props_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props as a MapType: parse JSON once to
    map<string,int>, then key enumeration / lookup / membership as
    collection functions (north-star props-column handling)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
    )


_SAMPLE_STABLE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(l_orderkey || '-' || l_linenumber), 1, 2) <= '19'
"""


@register("sample_stable", oracle=_SAMPLE_STABLE_ORACLE)
def sample_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable ~10% sample via a deterministic hash filter: keep rows
    whose md5(key) prefix falls below a threshold (0x00..0x19 of 0x100
    = 26/256 ≈ 10.2%). Unlike seeded RNG sampling (`df.sample`, whose
    generator is engine-specific), a content-hash filter reproduces
    bit-identically across engines AND across repartitions/retries —
    the property training-data pipelines actually need from a "stable"
    sample. Fully oracle-checked (DuckDB computes the same md5 filter).

    Scale note: evaluated at the scan — a codegen'd filter, no shuffle,
    no materialization of the rejected 90%. The right way to cut a
    100 TB corpus to a dev slice; rerunning on appended data keeps all
    previously-selected rows (hash, not position, decides membership).
    """
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", "l_orderkey", "l_linenumber")
    return li.filter(F.substring(F.md5(key), 1, 2) <= "19").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_Q18_ORACLE = """
SELECT c_name, o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_epoch,
       o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated subquery (semi join on a
    HAVING-filtered group set) -> 3-way join -> grouped sum -> top-20.

    Scale note: the subquery aggregates lineitem FIRST (its result is
    tiny — only the huge orders) and semi-joins back, so the big-table
    join runs on a pre-filtered key set; Catalyst plans the IN as a
    LeftSemi and AQE broadcasts the filtered keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(load_table(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_STRATIFIED_SAMPLE_ORACLE = """
SELECT event_id, event_type
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <=
      CASE event_type WHEN 'view' THEN '19' WHEN 'click' THEN '7f' ELSE 'ff' END
"""


@register("stratified_sample", oracle=_STRATIFIED_SAMPLE_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-stratum fraction) sampling — downsample dominant
    event types while keeping rare ones (the class-balance primitive of
    training-data curation). Per-stratum thresholds on a deterministic
    md5(key) prefix give ~10% of views, ~50% of clicks, 100% of the
    rare strata, reproducibly across engines (fully oracle-checked) —
    the portable twin of `df.sampleBy`, whose RNG is engine-specific.

    Scale note: a scan-side codegen'd filter per stratum — no shuffle,
    no materialization of the unsampled majority class, and membership
    is stable under repartition/retry/append because the hash of the
    row, not its position, decides.
    """
    ev = load_table(spark, sf_dir, "events")
    prefix = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    threshold = (
        F.when(F.col("event_type") == "view", F.lit("19"))
        .when(F.col("event_type") == "click", F.lit("7f"))
        .otherwise(F.lit("ff"))
    )
    return ev.filter(prefix <= threshold).select("event_id", "event_type")


_APPROX_PCT_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50_exact,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99_exact,
       TRUE AS approx_ok
FROM orders GROUP BY o_orderpriority
"""


@register("approx_percentiles", oracle=_APPROX_PCT_ORACLE)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per group — the mergeable, bounded-
    memory percentile for unbounded cardinality (exact twin:
    percentiles_exact). Oracle-checkable form: the output carries the
    exact interpolated percentiles (identical in both engines) plus
    ``approx_ok``, a Spark-side bound asserting each sketch estimate is
    within 5% of its exact value; the DuckDB twin emits literal TRUE,
    so sketch drift turns the row red.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99_approx"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 6).alias("p99_exact"),
    )
    within = lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.05)  # noqa: E731
    return agg.select(
        "o_orderpriority",
        "p50_exact",
        "p99_exact",
        (within("p50_approx", "p50_exact") & within("p99_approx", "p99_exact")).alias(
            "approx_ok"
        ),
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality between the
    two tables' columns -> left-semi join with residual -> priority
    counts. Expressed in SQL so Catalyst plans the correlated EXISTS
    (semi join keyed on l_orderkey, l_shipdate > o_orderdate residual).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q4_ORACLE)


_Q12_ORACLE = """
SELECT l_linestatus AS shipmode,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q12_shipmode_priority", oracle=_Q12_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + priority-class conditional
    counts (the testdata lacks l_shipmode; l_linestatus plays the
    grouping role). Same filtered-count pattern as the reference's
    clicked/unclicked adder, over a join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )
