"""Shared fixtures: one session-scoped SparkSession + H&M-shaped raw
envelope fixtures (FIXTURES.md): two ETL batches, ''-defaulting cases,
exact-duplicate transactions, multi-date (customer, article) repeats,
power-law customers, articles without images.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"

OLD_BATCH = ("old-batch-uuid", 1_600_000_000_000)
NEW_BATCH = ("new-batch-uuid", 1_700_000_000_000)


@pytest.fixture(scope="session")
def spark():
    from pyspark_recs.session import get_spark

    spark = get_spark("pyspark-recs-tests", shuffle_partitions=4, master="local[4]")
    yield spark


def _envelope(spark, table, rows, batches):
    data = []
    for etl_id, etl_ts in batches:
        for row in rows:
            data.append((etl_ts, etl_id, table, json.dumps(row)))
    return spark.createDataFrame(
        data, "etl_timestamp long, etl_id string, event_type string, raw_data string"
    )


ARTICLES = [
    # article 1..4; values are JSON strings like csv.DictReader output
    {"article_id": str(a), "product_code": str(100 + a),
     "product_type_no": str(a % 2), "product_group_name": f"grp{a % 2}",
     "graphical_appearance_no": "1", "colour_group_code": "2",
     "perceived_colour_value_id": "3", "perceived_colour_master_id": "4",
     "department_no": "5", "index_code": "A", "index_group_no": "6",
     "section_no": "7", "garment_group_no": "8"}
    for a in (1, 2, 3, 4)
]

CUSTOMERS = [
    {"Active": "1.0", "FN": "", "age": "31", "club_member_status": "ACTIVE",
     "customer_id": "c1", "fashion_news_frequency": "NONE", "postal_code": "z1"},
    {"Active": "", "FN": "1.0", "age": "", "club_member_status": "ACTIVE",
     "customer_id": "c2", "fashion_news_frequency": "Regularly",
     "postal_code": "z2"},
    {"Active": "0.0", "FN": "0.0", "age": "45", "club_member_status": "LEFT",
     "customer_id": "c3", "fashion_news_frequency": "NONE", "postal_code": "z3"},
]

# c1: 6 training-window purchases (frequent); c2: 2 (filtered out);
# c3: purchases only after the boundary. Duplicate rows + multi-date
# (article, customer) combos included.
TRANSACTIONS = (
    [
        {"article_id": "1", "customer_id": "c1", "price": "10.0",
         "sales_channel_id": "1", "t_dat": "2020-09-01"},
    ] * 2  # exact duplicate rows -> A2 dedup
    + [
        {"article_id": "1", "customer_id": "c1", "price": "12.0",
         "sales_channel_id": "2", "t_dat": "2020-09-03"},  # same pair, later date
        {"article_id": "2", "customer_id": "c1", "price": "20.0",
         "sales_channel_id": "1", "t_dat": "2020-09-02"},
        {"article_id": "3", "customer_id": "c1", "price": "30.0",
         "sales_channel_id": "1", "t_dat": "2020-09-04"},
        {"article_id": "4", "customer_id": "c1", "price": "40.0",
         "sales_channel_id": "1", "t_dat": "2020-09-05"},
        {"article_id": "2", "customer_id": "c1", "price": "21.0",
         "sales_channel_id": "2", "t_dat": "2020-09-06"},
        {"article_id": "1", "customer_id": "c2", "price": "11.0",
         "sales_channel_id": "1", "t_dat": "2020-09-02"},
        {"article_id": "2", "customer_id": "c2", "price": "22.0",
         "sales_channel_id": "1", "t_dat": "2020-09-07"},
        # post-training-window rows (valid/test splits)
        {"article_id": "3", "customer_id": "c1", "price": "31.0",
         "sales_channel_id": "1", "t_dat": "2020-09-10"},
        {"article_id": "4", "customer_id": "c1", "price": "41.0",
         "sales_channel_id": "1", "t_dat": "2020-09-20"},
        {"article_id": "1", "customer_id": "c3", "price": "13.0",
         "sales_channel_id": "1", "t_dat": "2020-09-21"},
    ]
)

IMAGES = [{"article_id": "1"}, {"article_id": "2"}]  # 3, 4 have no image

# A decoy row present only in the OLD batch: the latest-batch filter
# must drop it.
OLD_ONLY_ARTICLE = {"article_id": "99", "product_code": "999",
                    "product_type_no": "0", "product_group_name": "OLD",
                    "graphical_appearance_no": "0", "colour_group_code": "0",
                    "perceived_colour_value_id": "0",
                    "perceived_colour_master_id": "0", "department_no": "0",
                    "index_code": "X", "index_group_no": "0",
                    "section_no": "0", "garment_group_no": "0"}


@pytest.fixture(scope="session")
def raw_articles(spark):
    new = _envelope(spark, "articles", ARTICLES, [NEW_BATCH])
    old = _envelope(spark, "articles", ARTICLES + [OLD_ONLY_ARTICLE], [OLD_BATCH])
    return new.unionByName(old)


@pytest.fixture(scope="session")
def raw_customers(spark):
    return _envelope(spark, "customers", CUSTOMERS, [NEW_BATCH, OLD_BATCH])


@pytest.fixture(scope="session")
def raw_transactions(spark):
    return _envelope(spark, "transactions_train", TRANSACTIONS, [NEW_BATCH])


@pytest.fixture(scope="session")
def raw_images(spark):
    return _envelope(spark, "images_to_s3", IMAGES, [NEW_BATCH])
