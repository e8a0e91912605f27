"""End-to-end training-corpus preparation flow: the llmops operators
composed as one lazily-built DataFrame program (the LLM-data analog of
pipeline.run_flow's recsys DAG):

    quality-filter (gopher_rules) → near-dup dedup (LSH → verify →
    connected components → canonical-only) → chunk (overlapping token
    windows) → pack (token-budget bins)

Each stage is DataFrame→DataFrame; nothing is collected; the funnel
counts are themselves a DataFrame so the whole flow stays one plan
until an action runs.

Scale: the stages shuffle on doc_id / LSH band keys / the pack group
key only — never on document text. The quality filter is a pure
projection applied FIRST, so every downstream shuffle sees only
surviving documents (cheapest-filter-first, the same reason the
reference's dbt layer dedups before joining — SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_recs.llmops.dedup import (
    connected_components,
    verified_neardup_edges,
)
from pyspark_recs.llmops.textstats import (
    chunk_documents,
    gopher_rules,
    pack_sequences,
)


@dataclass
class CorpusResult:
    kept: DataFrame       # documents passing the quality rules
    canonical: DataFrame  # kept, minus near-duplicates (cluster reps)
    chunks: DataFrame     # overlapping token windows of canonical docs
    packed: DataFrame     # canonical docs assigned to token-budget bins
    funnel: DataFrame     # (stage, n_docs) retention counts


def prepare_corpus(
    docs: DataFrame,
    neardup_threshold: float = 0.5,
    chunk: int = 32,
    stride: int = 24,
    pack_capacity: int = 512,
    group_col: str = "source",
) -> CorpusResult:
    """Run the full corpus-prep flow over a ``documents``-shaped frame
    (doc_id, text, ``group_col``). Returns every stage as a DataFrame;
    nothing executes until the caller acts on one."""
    rules = gopher_rules(docs)
    kept = docs.join(
        rules.filter(F.col("passes")).select("doc_id"), "doc_id", "left_semi"
    )

    edges = verified_neardup_edges(kept, threshold=neardup_threshold)
    labels = connected_components(edges, kept.select("doc_id"))
    canonical = kept.join(
        labels.filter(F.col("node") == F.col("label"))
        .select(F.col("node").alias("doc_id")),
        "doc_id",
        "left_semi",
    )

    chunks = chunk_documents(canonical, chunk=chunk, stride=stride)
    packed = pack_sequences(
        canonical, capacity=pack_capacity, group_col=group_col
    )

    def stage_count(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_docs")
        )

    funnel = (
        stage_count("input", docs)
        .unionByName(stage_count("quality_kept", kept))
        .unionByName(stage_count("canonical", canonical))
        .unionByName(stage_count("chunks", chunks))
    )
    return CorpusResult(
        kept=kept,
        canonical=canonical,
        chunks=chunks,
        packed=packed,
        funnel=funnel,
    )
