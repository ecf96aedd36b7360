"""Schemas.

The reference's entire data plane is one implicit, fixed schema: the dict
literal built per Gmail message (reference etl_service/main.py:196-204). We
declare it explicitly, in two forms:

* EMAIL_SCHEMA        -- raw parity: the 7 string fields, labels flattened to
                         a CSV string exactly as ``",".join(labelIds)`` does
                         (reference etl_service/main.py:203).
* EMAIL_SCHEMA_RICH   -- idiomatic upgrade: labels kept ArrayType(String),
                         Date header parsed to TimestampType. The raw columns
                         stay present so parity queries still run.

GMAIL_MESSAGE_SCHEMA is the *intermediate* Gmail API shape the reference
consumes (reference etl_service/main.py:193-204): headers are a list of
{name, value} structs, labelIds a list of strings.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Gmail API message shape (source-side intermediate).
HEADER_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

GMAIL_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("threadId", T.StringType(), True),
        T.StructField("headers", T.ArrayType(HEADER_SCHEMA), True),
        T.StructField("labelIds", T.ArrayType(T.StringType()), True),
    ]
)

# Raw-parity sink schema: 7 fields, all strings (reference main.py:196-204).
EMAIL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("threadId", T.StringType(), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("sender", T.StringType(), True),
        T.StructField("recipient", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("combined_labels", T.StringType(), True),
    ]
)

# Enriched form: native array labels + parsed event time.
EMAIL_SCHEMA_RICH = T.StructType(
    list(EMAIL_SCHEMA.fields)
    + [
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
