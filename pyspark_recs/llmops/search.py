"""Keyword search over the document corpus: BM25 ranking.

The inverted-index shape expressed relationally: explode → term filter →
per-(doc, term) tf → broadcast per-term idf → fixed-point score sum.
All JVM-side aggregates; the only floats are per-term scalar divisions
with a fixed operation order, and the cross-term sum is integer
fixed-point — so scores are bit-identical across engines, partitionings
and re-runs (an unordered double sum would not be).

The idf is the *log-free rational* variant
``(N - df + 0.5) / (df + 0.5)`` rather than its logarithm: ln() is
libm-dependent and this repo keeps scores transcendental-free for
bit-portability (see textstats.py). Rankings differ from textbook BM25
only in scale compression, not in per-term ordering.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_recs.llmops.textstats import tokens

SCORE_SCALE = 1_000_000_000  # fixed-point: 1e-9 score resolution


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Rank the top-``k`` documents for a bag-of-words query by
    (log-free) BM25. Returns (rank, doc_id, score).

    Scale: tf is one map-side-combined groupBy over the exploded
    term-filtered corpus (the filter drops every non-query token before
    the shuffle, so the exchange carries |query terms| × docs-hit rows,
    not the corpus); df/N/avgdl are scalar aggregates broadcast back;
    the final top-k is TakeOrderedAndProject, never a global sort."""
    term_lits = [F.lit(t) for t in terms]

    base = docs.select("doc_id", tokens(F.col(text_col)).alias("words"))
    lens = base.select("doc_id", F.size("words").cast("long").alias("dl"))

    # Corpus scalars: N and average doc length (single-row broadcast).
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
    ).select("n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl"))

    # Per-(doc, term) tf over the term-filtered exploded corpus.
    tf = (
        base.select(
            "doc_id",
            F.explode(
                F.filter(F.col("words"), lambda w: w.isin(*term_lits))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl"))
    )
    # Fixed-point per-term contribution, then an integer cross-term sum —
    # the one place ordering could leak into the result.
    contrib = F.floor(idf * tfc * F.lit(SCORE_SCALE) + F.lit(0.5)).cast("long")
    per_doc = scored.groupBy("doc_id").agg(
        (F.sum(contrib).cast("double") / F.lit(SCORE_SCALE)).alias("score")
    )
    # limit(k) first so the rank window runs over k rows on one
    # partition, not the corpus (TakeOrderedAndProject does the top-k).
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select(rank.alias("rank"), "doc_id", "score")
