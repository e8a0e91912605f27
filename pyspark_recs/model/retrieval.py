"""Retrieval model: ALS implicit-feedback as the Spark-native analog of
the reference's Two-Tower model (SURVEY §2.7 M1-M5).

The reference trains a TF Two-Tower (user tower ⊕ item tower, in-batch
negatives, my_merlin_flow.py:307-323) and serves brute-force top-k
(:333-345). Capability parity — "learn user & item vectors, retrieve
top-k by inner product" — maps to MLlib ``ALS(implicitPrefs=True)``:
the towers degenerate to id embeddings, and
``recommendForUserSubset`` is the blocked-GEMM top-k (no crossJoin).

Grid-search fan-out (M2, my_merlin_flow.py:248-263) runs explicit
time-split evaluation — NOT random CV — matching the reference's
foreach over hyperparameter configs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_als(
    interactions: DataFrame,
    rank: int = 64,
    max_iter: int = 10,
    reg_param: float = 0.1,
    alpha: float = 1.0,
    seed: int = 42,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "n_purchases",
):
    """Fit implicit-feedback ALS on a (user, item, strength) matrix.

    Scale: ALS partitions the rating matrix into blocks; set
    num{User,Item}Blocks ~ cluster cores at real scale. Ids must be
    int-typed — the Categorify estimator (features/) produces exactly
    that contract, mirroring the reference's NVT Categorify
    (workflow_builder.py:18-24)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        alpha=alpha,
        implicitPrefs=True,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
        seed=seed,
    )
    return als.fit(
        interactions.select(
            F.col(user_col).cast("int").alias(user_col),
            F.col(item_col).cast("int").alias(item_col),
            F.col(rating_col).cast("float").alias(rating_col),
        )
    )


def recommend_topk(model, users: DataFrame, k: int = 10) -> DataFrame:
    """Top-k retrieval for a user subset, exploded to
    (user_id, item_id, score, rank) — the keyed predictions-table shape
    (M5, my_merlin_flow.py:524-537).

    recommendForUserSubset performs the blocked matrix-multiply top-k
    inside MLlib — never a crossJoin (SURVEY §4 custom-work item 2)."""
    user_col = model.getUserCol()
    recs = model.recommendForUserSubset(
        users.select(F.col(user_col).cast("int").alias(user_col)), k
    )
    return recs.select(
        user_col,
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        F.col(user_col).alias("user_id"),
        F.col("rec.item_id").alias("item_id"),
        F.col("rec.rating").cast("double").alias("score"),
        (F.col("pos") + 1).alias("rank"),
    )


@dataclass
class GridResult:
    params: dict
    metrics: dict
    model: object


def grid_search(
    train: DataFrame,
    valid_truth: DataFrame,
    param_grid: list[dict],
    k: int = 10,
    seed: int = 42,
) -> list[GridResult]:
    """Explicit hyperparameter fan-out with time-split validation (M2) +
    argmax selection by recall@k (A4, my_merlin_flow.py:355-364).

    Runs sequentially here; on a cluster submit each fit in a scheduler
    pool (FAIR) for the reference's --max-workers parallelism. Returns
    results sorted best-first by recall@k."""
    from pyspark_recs.model.metrics import ranking_metrics

    results = []
    for params in param_grid:
        model = train_als(train, seed=seed, **params)
        users = valid_truth.select("user_id").distinct()
        preds = recommend_topk(model, users, k=k)
        metrics = ranking_metrics(preds, valid_truth, k=k)
        results.append(GridResult(params=params, metrics=metrics, model=model))
    return sorted(
        results, key=lambda r: r.metrics[f"recall_at_{k}"], reverse=True
    )
