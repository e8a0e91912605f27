"""Ranking metrics: recall@k and NDCG@k (SURVEY §2.7 M3 —
RecallAt/NDCGAt, my_merlin_flow.py:71-75,316-318).

Computed relationally (join predictions to ground truth, aggregate) —
no driver-side collection, so the evaluation itself scales to the full
user population.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_metrics(
    predictions: DataFrame,
    truth: DataFrame,
    k: int = 10,
) -> dict:
    """recall@k and ndcg@k.

    ``predictions``: (user_id, item_id, rank) with rank 1..k.
    ``truth``: (user_id, item_id) held-out positives.

    recall@k = mean over users of |hits| / min(|truth_u|, k).
    ndcg@k   = mean over users of DCG(hits)/IDCG(min(|truth_u|, k)),
    binary relevance, log2 discount.
    """
    preds = predictions.filter(F.col("rank") <= k).select(
        "user_id", "item_id", "rank"
    )
    t = truth.select("user_id", "item_id").distinct()
    truth_sizes = t.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_truth"))

    hits = preds.join(t, on=["user_id", "item_id"], how="inner")
    per_user_hits = hits.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum(1.0 / F.log2(F.col("rank") + 1)).alias("dcg"),
    )

    # IDCG lookup for 1..k ideal hits, broadcast as a tiny table.
    idcg = [0.0]
    for i in range(1, k + 1):
        idcg.append(idcg[-1] + 1.0 / math.log2(i + 1))

    per_user = (
        truth_sizes.join(per_user_hits, on="user_id", how="left")
        .fillna(0, subset=["n_hits", "dcg"])
        .withColumn("denom", F.least(F.col("n_truth"), F.lit(k)))
        .withColumn(
            "idcg",
            F.element_at(
                F.array(*[F.lit(v) for v in idcg]), F.col("denom").cast("int") + 1
            ),
        )
    )
    row = per_user.agg(
        F.avg(F.col("n_hits") / F.col("denom")).alias("recall"),
        F.avg(F.col("dcg") / F.col("idcg")).alias("ndcg"),
        F.count(F.lit(1)).alias("n_users"),
    ).collect()[0]
    return {
        f"recall_at_{k}": row.recall or 0.0,
        f"ndcg_at_{k}": row.ndcg or 0.0,
        "n_users": row.n_users,
    }
