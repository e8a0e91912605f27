"""Categorify: dictionary-encoding estimator/transformer (SURVEY §2.7
F1 — NVTabular ``Categorify()``, workflow_builder.py:18-58).

Semantics reproduced from the reference:
- fit builds a per-column dictionary of distinct non-null values;
  code = position, **0 reserved for null/OOV** (NVT convention);
- dictionaries persist as parquet mirroring ``unique.<col>.parquet``
  (my_merlin_flow.py:242-246), and double as the inverse mapping
  (replacing the reference's driver-side ``id_2_item_id`` dicts —
  SURVEY §7 100-TB-honesty: joins, never collect());
- determinism: codes follow value sort order, so refits on identical
  input yield identical dictionaries (SURVEY §7 watch-list).

Scale: fit is distinct + ordered code assignment. For dictionaries that
fit a broadcast (≤ ~100M values) we use a single ordered window per
column — acceptable because the *distinct* set, not the data, flows
through it. For larger cardinalities ``zipWithIndex``-style offset
assignment would replace the window (documented, not needed at test
scale). Transform is a broadcast left join per column — no shuffle of
the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class CategorifyModel:
    """Fitted dictionaries: {column -> DataFrame[value, code]}."""

    def __init__(self, dictionaries: dict[str, DataFrame]):
        self.dictionaries = dictionaries

    def transform(self, df: DataFrame, suffix: str = "_code") -> DataFrame:
        """Map each fitted column to its code; null/OOV -> 0.

        Each mapping is a broadcast hash join (the dict is small by
        construction); the input never shuffles."""
        out = df
        for col, dictionary in self.dictionaries.items():
            mapping = dictionary.withColumnRenamed("value", col)
            out = (
                out.join(F.broadcast(mapping), on=col, how="left")
                .withColumn(
                    col + suffix,
                    F.coalesce(F.col("code"), F.lit(0)).cast("long"),
                )
                .drop("code")
            )
        return out

    def inverse(self, col: str) -> DataFrame:
        """code -> original value (the reference's id_2_* dicts as a
        joinable DataFrame)."""
        return self.dictionaries[col].select(
            F.col("code"), F.col("value").alias(col)
        )

    def save(self, path: str) -> None:
        """Persist dictionaries as ``unique.<col>.parquet`` dirs,
        mirroring the NVT artifact layout (my_merlin_flow.py:242-246)."""
        for col, dictionary in self.dictionaries.items():
            dictionary.write.mode("overwrite").parquet(
                os.path.join(path, f"unique.{col}.parquet")
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str, cols: list[str]) -> "CategorifyModel":
        return cls(
            {
                col: spark.read.parquet(
                    os.path.join(path, f"unique.{col}.parquet")
                )
                for col in cols
            }
        )


class Categorify:
    """Estimator: fit dictionaries over the given columns.

    Fit on the union of all splits (O5 semantics,
    my_merlin_flow.py:233) so the category space is shared across
    train/valid/test — pass the unioned DataFrame."""

    def __init__(self, cols: list[str]):
        self.cols = list(cols)

    def fit(self, df: DataFrame) -> CategorifyModel:
        dictionaries = {}
        for col in self.cols:
            w = Window.orderBy(F.col("value").asc())
            dictionaries[col] = (
                df.select(F.col(col).alias("value"))
                .filter(F.col("value").isNotNull())
                .distinct()
                .withColumn("code", F.row_number().over(w).cast("long"))
            )
        return CategorifyModel(dictionaries)
