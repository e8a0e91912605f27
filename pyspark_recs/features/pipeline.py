"""The reference's full feature-engineering graph (workflow_builder.py:
13-76) as one fit/transform pipeline over DataFrames (SURVEY §2.7
F1-F7):

  F1 Categorify(user_id, item_id, user/item/context cats)
  F2 FillMissing(0) on continuous cols
  F3 Bucketize(age-like col, fixed-width buckets)
  F4 month/year context features (LambdaOp + Rename)
  F5 per-item mean price -> FillMissing -> Normalize (z-score)
  F6 semantic tags on every output column
  F7 the composed graph itself

``fit`` runs on the union of splits (O5, my_merlin_flow.py:233);
``transform`` applies to each split. All statistics (dictionaries,
mean/std) are computed once at fit and reused — fit-once,
transform-many (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_recs.features.categorify import Categorify, CategorifyModel
from pyspark_recs.features.tags import add_tags
from pyspark_recs.sql.transforms import bucketize_fixed_width


@dataclass
class FeaturePipelineModel:
    categorify: CategorifyModel
    item_avg: DataFrame  # item_id -> avg of value_col (F5 fit stat)
    mu: float
    sigma: float
    config: "FeaturePipelineConfig"

    def transform(self, df: DataFrame) -> DataFrame:
        cfg = self.config
        out = df
        # F4: date-part context features (before Categorify so they can
        # be encoded too if listed).
        if cfg.event_time_col:
            out = out.withColumn(
                "purchase_month", F.month(cfg.event_time_col)
            ).withColumn("purchase_year", F.year(cfg.event_time_col))
        # F2: fill missing continuous
        if cfg.fill_zero_cols:
            out = out.fillna(0, subset=list(cfg.fill_zero_cols))
        # F3: bucketize
        if cfg.bucket_col:
            out = bucketize_fixed_width(
                out, cfg.bucket_col, cfg.bucket_width,
                alias=f"{cfg.bucket_col}_bucket",
            )
        # F1: dictionary-encode
        out = self.categorify.transform(out)
        # F5: per-item mean -> fill 0 -> z-score with fit-time mu/sigma
        if cfg.value_col:
            out = (
                out.join(F.broadcast(self.item_avg), on=cfg.item_col, how="left")
                .withColumn("avg_price", F.coalesce("avg_price", F.lit(0.0)))
                .withColumn(
                    "avg_price_z",
                    (F.col("avg_price") - F.lit(self.mu)) / F.lit(self.sigma),
                )
            )
        # F6: semantic tags
        tag_map = {
            f"{cfg.user_col}_code": ["user", "user_id"],
            f"{cfg.item_col}_code": ["item", "item_id"],
            "purchase_month": ["context"],
            "purchase_year": ["context"],
            "avg_price_z": ["item"],
        }
        tag_map.update(
            {f"{c}_code": ["user"] for c in cfg.user_feature_cols}
        )
        tag_map.update(
            {f"{c}_code": ["item"] for c in cfg.item_feature_cols}
        )
        return add_tags(out, {k: v for k, v in tag_map.items() if k in out.columns})


@dataclass
class FeaturePipelineConfig:
    user_col: str
    item_col: str
    user_feature_cols: tuple = ()
    item_feature_cols: tuple = ()
    event_time_col: str | None = None
    value_col: str | None = None  # price-like col for F5
    bucket_col: str | None = None  # age-like col for F3
    bucket_width: float = 5.0
    fill_zero_cols: tuple = ()


@dataclass
class FeaturePipeline:
    config: FeaturePipelineConfig
    categorify_extra_cols: tuple = field(default=())

    def fit(self, df: DataFrame) -> FeaturePipelineModel:
        cfg = self.config
        cat_cols = [
            cfg.user_col,
            cfg.item_col,
            *cfg.user_feature_cols,
            *cfg.item_feature_cols,
            *self.categorify_extra_cols,
        ]
        categorify = Categorify(cat_cols).fit(df)

        item_avg, mu, sigma = None, 0.0, 1.0
        if cfg.value_col:
            item_avg = df.groupBy(cfg.item_col).agg(
                F.avg(cfg.value_col).alias("avg_price")
            )
            stats = item_avg.agg(
                F.avg("avg_price").alias("mu"),
                F.stddev_samp("avg_price").alias("sigma"),
            ).collect()[0]
            mu = stats.mu or 0.0
            sigma = stats.sigma or 1.0
        return FeaturePipelineModel(
            categorify=categorify,
            item_avg=item_avg,
            mu=mu,
            sigma=sigma,
            config=cfg,
        )
