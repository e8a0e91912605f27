"""Canonical typed schemas for the recsys pipeline tables (SURVEY §1.2-
1.3, FIXTURES.md): the raw JSON-envelope layer and the staged payload
schemas with their casts.

The raw layer is schema-on-read: a fixed 4-column envelope whose real
schema lives in the JSON payload and is imposed by the staging casts
(articles_staging.sql:9-22 "get the columns we need"). Unknown JSON keys
are ignored; missing keys become NULL.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw envelope (upload_to_snowflake.py:46-57): every raw table shares it.
RAW_ENVELOPE = StructType(
    [
        StructField("etl_timestamp", LongType()),  # epoch millis per batch
        StructField("etl_id", StringType()),  # uuid4 per batch
        StructField("event_type", StringType()),  # source table name
        StructField("raw_data", StringType()),  # the row as a JSON object
    ]
)

# Payload schemas: (field, type) in staging-cast order. All raw JSON
# values are strings (csv.DictReader); staging imposes the casts.
ARTICLES_FIELDS = [
    ("article_id", IntegerType()),
    ("product_code", IntegerType()),
    ("product_type_no", IntegerType()),
    ("product_group_name", StringType()),
    ("graphical_appearance_no", IntegerType()),
    ("colour_group_code", IntegerType()),
    ("perceived_colour_value_id", IntegerType()),
    ("perceived_colour_master_id", IntegerType()),
    ("department_no", IntegerType()),
    ("index_code", StringType()),
    ("index_group_no", IntegerType()),
    ("section_no", IntegerType()),
    ("garment_group_no", IntegerType()),
]

# customers_staging.sql:11-17 — active/fn/age get ''-to-0.0 defaulting.
# JSON keys keep the source CSV's original case (RAW_DATA:"Active");
# output names are lower_snake_case (P6, my_merlin_flow.py:190-192).
CUSTOMERS_FIELDS = [
    ("active", DoubleType()),
    ("fn", DoubleType()),
    ("age", DoubleType()),
    ("club_member_status", StringType()),
    ("customer_id", StringType()),
    ("fashion_news_frequency", StringType()),
    ("postal_code", StringType()),
]
CUSTOMERS_DEFAULTED = ("active", "fn", "age")
CUSTOMERS_JSON_KEYS = {"active": "Active", "fn": "FN"}

TRANSACTIONS_FIELDS = [
    ("article_id", IntegerType()),
    ("customer_id", StringType()),
    ("price", DoubleType()),
    ("sales_channel_id", IntegerType()),
    ("t_dat", TimestampType()),
]

IMAGES_FIELDS = [("article_id", IntegerType())]

S3_URL_PREFIX = "https://images.example.com/"
