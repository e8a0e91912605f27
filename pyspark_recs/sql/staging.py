"""The reference's staging + transform models (the 8 dbt SQL models,
SURVEY §3.2) as composable DataFrame functions over the JSON-envelope
raw layer.

The dbt ref-graph becomes plain function composition — Catalyst fuses
the whole chain into one optimized plan instead of materializing every
model as a table (SURVEY §3.2's key architectural win).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType, TimestampType

from pyspark_recs.schemas import (
    ARTICLES_FIELDS,
    CUSTOMERS_DEFAULTED,
    CUSTOMERS_FIELDS,
    CUSTOMERS_JSON_KEYS,
    IMAGES_FIELDS,
    S3_URL_PREFIX,
    TRANSACTIONS_FIELDS,
)
from pyspark_recs.sql.transforms import (
    dedup_last_value,
    frequency_filter,
    latest_batch,
)


def json_field(
    raw: Column, name: str, dtype: DataType, json_key: str | None = None
) -> Column:
    """``RAW_DATA:"field"::TYPE`` (P1, articles_staging.sql:10-22).

    Values in raw_data are all JSON strings (csv.DictReader); the cast
    imposes the real type. JSON keys keep source-CSV case
    (RAW_DATA:"Active"); output names are lowercase (P6). Timestamp
    fields are date-granular ``yyyy-mm-dd`` strings
    (my_merlin_flow.py:53)."""
    v = F.get_json_object(raw, f"$.{json_key or name}")
    if isinstance(dtype, TimestampType):
        return F.to_timestamp(v, "yyyy-MM-dd").alias(name)
    return v.cast(dtype).alias(name)


def json_field_defaulted(
    raw: Column, name: str, json_key: str | None = None
) -> Column:
    """``COALESCE(NULLIF(x, ''), 0.0)::FLOAT`` (P3,
    customers_staging.sql:11-13)."""
    v = F.get_json_object(raw, f"$.{json_key or name}")
    return (
        F.coalesce(F.nullif(v, F.lit("")), F.lit("0.0"))
        .cast(DoubleType())
        .alias(name)
    )


def _staged(raw: DataFrame, fields, defaulted=(), json_keys=None) -> DataFrame:
    json_keys = json_keys or {}
    kept = latest_batch(raw, batch_col="etl_id", order_col="etl_timestamp")
    cols = [
        json_field_defaulted(F.col("raw_data"), name, json_keys.get(name))
        if name in defaulted
        else json_field(F.col("raw_data"), name, dtype, json_keys.get(name))
        for name, dtype in fields
    ]
    return kept.select(*cols)


def articles_staging(raw_articles: DataFrame) -> DataFrame:
    """articles_staging.sql:1-27 — latest batch + 13 typed extractions."""
    return _staged(raw_articles, ARTICLES_FIELDS)


def customers_staging(raw_customers: DataFrame) -> DataFrame:
    """customers_staging.sql:1-22 — latest batch + ''-defaulting for
    active/fn/age."""
    return _staged(
        raw_customers, CUSTOMERS_FIELDS, CUSTOMERS_DEFAULTED, CUSTOMERS_JSON_KEYS
    )


def transactions_staging(raw_transactions: DataFrame) -> DataFrame:
    """transactions_staging.sql:1-20."""
    return _staged(raw_transactions, TRANSACTIONS_FIELDS)


def images_staging(raw_images: DataFrame) -> DataFrame:
    """images_staging.sql:1-15 — latest batch + S3-URL synthesis (P4)."""
    staged = _staged(raw_images, IMAGES_FIELDS)
    return staged.select(
        "article_id",
        F.concat(
            F.lit(S3_URL_PREFIX),
            F.col("article_id").cast("string"),
            F.lit(".jpg"),
        ).alias("s3_url"),
    )


def dedup_transactions(transactions: DataFrame) -> DataFrame:
    """dedup_transactions.sql:1-17 (A2 + W1): GROUP-BY-all distinct,
    then last_value overwrite of (price, sales_channel_id, t_dat) per
    (article, customer) over the WHOLE partition (the Snowflake frame
    default — SURVEY §2.5's one real porting hazard).

    Faithful to the W2 wart: residual identical rows are preserved."""
    return dedup_last_value(
        transactions,
        group_keys=["article_id", "customer_id"],
        order_cols=["t_dat"],
        value_cols=["price", "sales_channel_id", "t_dat"],
    )


def articles_metadata(articles: DataFrame, images: DataFrame) -> DataFrame:
    """articles_metadata.sql:1-7 (J2): LEFT join keeps articles without
    an image (NULL s3_url)."""
    return articles.join(F.broadcast(images), on="article_id", how="left")


def joined_dataframe(
    dedup_tx: DataFrame, articles_meta: DataFrame, customers: DataFrame
) -> DataFrame:
    """joined_dataframe.sql:1-16 (J3): 3-way inner join with explicit
    named projection (the a_s.*/c_s.* duplicate-column wart resolved by
    construction — SURVEY §7 watch-list).

    Scale: both dims broadcast; the fact table never shuffles."""
    art_cols = [c for c in articles_meta.columns if c != "article_id"]
    cust_cols = [c for c in customers.columns if c != "customer_id"]
    return (
        dedup_tx.join(F.broadcast(articles_meta), on="article_id", how="inner")
        .join(F.broadcast(customers), on="customer_id", how="inner")
        .select(
            "article_id",
            "customer_id",
            *art_cols,
            *cust_cols,
            "price",
            "sales_channel_id",
            "t_dat",
        )
    )


def filtered_dataframe(
    joined: DataFrame, train_end: str, min_purchases: int = 5
) -> DataFrame:
    """filtered_dataframe.sql:1-19 (A1 + J4): keep customers with >=
    min_purchases in the training window; the frequency CTE is computed
    on the *joined* facts exactly like the reference (which counts rows
    of joined_dataframe, :1-12)."""
    return frequency_filter(
        joined,
        key="customer_id",
        min_count=min_purchases,
        pred=F.col("t_dat") < F.lit(train_end).cast("timestamp"),
    )
