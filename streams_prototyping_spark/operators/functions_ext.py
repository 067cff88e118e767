"""Extended scalar/array/window-value function surface.

Rounds out the function library a KSQL/SQL user expects (SURVEY §2
Part C records the reference has arithmetic only): regex, string
padding/partial extraction, array/collection manipulation, and the
value-window functions (first/last/nth, percent_rank/cume_dist). All
pure Catalyst expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.registry import register

_REGEX_ORACLE = r"""
SELECT p_partkey,
       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
       regexp_matches(p_type, '^[a-z]+ ') AS type_has_prefix,
       split_part(p_type, ' ', 1) AS type_first,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       rpad(p_brand, 12, '.') AS brand_padded,
       translate(p_brand, '#', '-') AS brand_translated,
       strpos(p_name, 'o') AS first_o_pos,
       starts_with(p_type, 's') AS type_starts_s,
       ends_with(p_name, 'e') AS name_ends_e,
       left(p_name, 4) AS name_left4,
       right(p_name, 4) AS name_right4,
       reverse(p_brand) AS brand_reversed,
       repeat('*', p_size % 5) AS stars
FROM part
"""


@register("regex_string_functions", oracle=_REGEX_ORACLE)
def regex_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + extended string functions (extract/replace/match,
    split_part, pad, translate, position, affix tests, left/right,
    reverse, repeat)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.col("p_type").rlike("^[a-z]+ ").alias("type_has_prefix"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_brand", "#", "-").alias("brand_translated"),
        F.instr("p_name", "o").alias("first_o_pos"),
        F.startswith("p_type", F.lit("s")).alias("type_starts_s"),
        F.endswith("p_name", F.lit("e")).alias("name_ends_e"),
        F.substring("p_name", 1, 4).alias("name_left4"),
        F.substring(F.col("p_name"), -4, 4).alias("name_right4"),
        F.reverse("p_brand").alias("brand_reversed"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5)).alias("stars"),
    )


_ARRAY_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       list_contains(words, 'spark') AS has_spark,
       list_position(words, 'the') AS first_the,
       list_max(words) AS max_word,
       list_min(words) AS min_word,
       array_to_string(list_sort(list_distinct(words), 'DESC'), ',') AS words_desc,
       array_to_string(list_slice(words, 2, 4), ',') AS words_2_to_4,
       array_to_string(list_filter(words, x -> x <> 'the'), ',') AS words_no_the,
       len(flatten([words, words])) AS doubled_len,
       array_to_string(list_transform(range(3), x -> words[1]), ',') AS first_word_x3
FROM w
"""


@register("array_functions", oracle=_ARRAY_ORACLE)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection surface: membership, position, extrema,
    descending sort, slice, filter, flatten, repeat."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_position(words, "the").alias("first_the"),
        F.array_max(words).alias("max_word"),
        F.array_min(words).alias("min_word"),
        F.array_join(
            F.sort_array(F.array_distinct(words), asc=False), ","
        ).alias("words_desc"),
        F.array_join(F.slice(words, 2, 3), ",").alias("words_2_to_4"),
        F.array_join(
            F.filter(words, lambda x: x != "the"), ","
        ).alias("words_no_the"),
        F.size(F.flatten(F.array(words, words))).cast("long").alias("doubled_len"),
        F.array_join(
            F.array_repeat(F.element_at(words, 1), 3), ","
        ).alias("first_word_x3"),
    )


_VALUE_WINDOW_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       first_value(c_custkey) OVER w AS richest_cust,
       last_value(c_custkey) OVER w_full AS poorest_cust,
       nth_value(c_custkey, 2) OVER w_full AS second_richest,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS segment_size
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
       w_full AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_value_functions", oracle=_VALUE_WINDOW_ORACLE)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit full frames (the default
    frame ends at CURRENT ROW — last_value without a frame is a classic
    correctness trap), percent_rank/cume_dist, partition-wide count."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_part = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.last("c_custkey").over(w_full).alias("poorest_cust"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.count(F.lit(1)).over(w_part).cast("long").alias("segment_size"),
    )
