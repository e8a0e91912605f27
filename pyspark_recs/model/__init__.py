from pyspark_recs.model.retrieval import (
    grid_search,
    recommend_topk,
    train_als,
)
from pyspark_recs.model.metrics import ranking_metrics

__all__ = ["grid_search", "ranking_metrics", "recommend_topk", "train_als"]
