"""Semantic column tags (SURVEY §2.7 F6 — NVTabular ``AddMetadata``,
workflow_builder.py:18-68): user/item/user_id/item_id tags stored in
``StructField.metadata``, so tag-driven column selection
(my_merlin_flow.py:307-310 ``schema.select_by_tag``) survives parquet
round-trips natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAG_KEY = "tags"


def add_tags(df: DataFrame, tag_map: dict[str, list[str]]) -> DataFrame:
    """Attach tags to columns via field metadata (metadata-only op —
    no data movement)."""
    cols = []
    for field in df.schema.fields:
        if field.name in tag_map:
            meta = dict(field.metadata or {})
            existing = set(meta.get(TAG_KEY, []))
            meta[TAG_KEY] = sorted(existing | set(tag_map[field.name]))
            cols.append(F.col(field.name).alias(field.name, metadata=meta))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def get_tags(df: DataFrame, col: str) -> list[str]:
    for field in df.schema.fields:
        if field.name == col:
            return list((field.metadata or {}).get(TAG_KEY, []))
    raise KeyError(col)


def select_by_tag(df: DataFrame, tag: str) -> list[str]:
    """Column names carrying ``tag`` (the model's input-selection
    surface)."""
    return [
        field.name
        for field in df.schema.fields
        if tag in (field.metadata or {}).get(TAG_KEY, [])
    ]
