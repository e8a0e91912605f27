from pyspark_recs.model.retrieval import (
    grid_search,
    rerank_with_features,
    recommend_topk,
    train_als,
)
from pyspark_recs.model.metrics import ranking_metrics

__all__ = [
    "grid_search",
    "ranking_metrics",
    "recommend_topk",
    "rerank_with_features",
    "train_als",
]
