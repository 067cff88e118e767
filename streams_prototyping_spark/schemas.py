"""Explicit StructType schemas for the reference's stream data model.

The reference hardcodes these in POJO field lists (SURVEY.md §1.2):
- orders:       reference Aggregations.java:36-47
- impressions:  reference StreamStreamJoin.java:192-203 + impressions.avro
- clicks:       reference StreamStreamJoin.java:171-184 + click.avro
- ads_with_clicks (join output): reference StreamStreamJoin.java:211-222

Event-time longs become TimestampType so Spark watermarks/windows apply.
The wire format is delimited CSV (value_format='delimited',
StreamStreamJoin.java:30); see csv_codec for the ingest/egress mapping.
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference Aggregations.java:36-47 (OrderData POJO)
ORDERS_STREAM = T.StructType(
    [
        T.StructField("order_time", T.TimestampType(), False),
        T.StructField("order_id", T.IntegerType(), False),
        T.StructField("item_name", T.StringType(), True),
        T.StructField("order_value", T.DoubleType(), False),
    ]
)

# reference StreamStreamJoin.java:192-203 (Impression POJO)
IMPRESSIONS_STREAM = T.StructType(
    [
        T.StructField("impression_time", T.TimestampType(), False),
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("ad_id", T.StringType(), True),
    ]
)

# reference StreamStreamJoin.java:171-184 (Click POJO)
CLICKS_STREAM = T.StructType(
    [
        T.StructField("click_time", T.TimestampType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("ad_id", T.StringType(), True),
        T.StructField("click_id", T.StringType(), False),
    ]
)

# reference StreamStreamJoin.java:211-222 (ImpressionAndClick POJO)
ADS_WITH_CLICKS = T.StructType(
    [
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("ad_id", T.StringType(), True),
        T.StructField("was_clicked", T.BooleanType(), False),
    ]
)
