"""Sequence features for next-item-prediction training and funnel
analysis over an event stream.

Both operators are single-window / single-join-chain compositions — the
shapes a sequential recommender's data prep runs over trillions of
events (reference analog: the interaction assembly feeding the
two-tower model, my_merlin_flow.py:154-185, extended to the sequential
/ session-based setting).

Scale design:
- ``next_item_pairs`` is ONE window partitioned by user — one shuffle
  on user_id, history bounded to the last ``history_len`` items so
  state per row is O(history_len), never the full user history.
- ``funnel_stages`` is a chain of strictly-shrinking per-user
  aggregates joined on user_id; co-partitioned on the same key, so AQE
  plans one exchange chain and each stage's join input is smaller than
  the last. The final output is three scalar counts — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_item_pairs(
    events: DataFrame,
    item_expr: str = "CAST(get_json_object(props, '$.k') AS BIGINT)",
    history_len: int = 3,
) -> DataFrame:
    """(history, next-item) supervised pairs for sequential
    recommendation: per user, events ordered by (ts, event_id); each
    event becomes a training example whose input is the previous
    ``history_len`` item ids (comma-joined string — deterministic,
    oracle-comparable) and whose label is the current item.

    Rows with empty history (the user's first event) are dropped — they
    carry no sequence signal.
    """
    ev = events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(item_expr).alias("item_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-history_len, -1)
    )
    hist = F.collect_list("item_id").over(w)
    return (
        ev.withColumn(
            "history",
            F.array_join(hist.cast("array<string>"), ","),
        )
        .filter(F.col("history") != "")
        .select("user_id", "event_id", "history", F.col("item_id").alias("label"))
    )


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel conversion: users who did stage1, then stage2
    strictly after their first stage1, then stage3 strictly after that
    — the sessionized product-analytics primitive.

    Returns one row per stage: (stage, stage_idx, n_users,
    share_of_entry). share is a single bigint/bigint IEEE division —
    bit-exact vs the SQL oracle.
    """
    s1, s2, s3 = stages
    ev = events.select("user_id", "ts", "event_type")
    t1 = (
        ev.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == s3)
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        t1.agg(F.count("*").alias("n1"))
        .crossJoin(t2.agg(F.count("*").alias("n2")))
        .crossJoin(t3.agg(F.count("*").alias("n3")))
    )
    stacked = counts.selectExpr(
        f"stack(3, '{s1}', 1, n1, '{s2}', 2, n2, '{s3}', 3, n3) "
        "AS (stage, stage_idx, n_users)",
        "n1",
    )
    return stacked.select(
        "stage",
        F.col("stage_idx").cast("int").alias("stage_idx"),
        F.col("n_users").cast("long").alias("n_users"),
        (F.col("n_users").cast("double") / F.col("n1").cast("double")).alias(
            "share_of_entry"
        ),
    )


def item_transitions(
    events: DataFrame,
    item_expr: str = "CAST(get_json_object(props, '$.k') AS BIGINT)",
) -> DataFrame:
    """First-order Markov transition matrix over per-user item
    sequences: P(next = dst | current = src) estimated from consecutive
    event pairs — the statistic behind Markov-chain / session-based
    recommenders and the sanity check behind sequence-model baselines.

    One lead() window per user generates the (src, dst) pairs, then two
    combiner-friendly aggregates count transitions and row-normalize.
    The probability is one bigint/bigint IEEE division — bit-exact vs
    the SQL oracle.

    Scale: the window shuffles once on user_id with O(1) state per row;
    the transition aggregate shuffles (src, dst) pairs, whose
    cardinality is bounded by the (item × item) support actually
    observed, not by events. No self-joins.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.expr(item_expr).alias("src_item"),
        )
        .withColumn("dst_item", F.lead("src_item").over(w))
        .filter(F.col("dst_item").isNotNull())
    )
    counts = pairs.groupBy("src_item", "dst_item").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_src = Window.partitionBy("src_item")
    return counts.select(
        "src_item",
        "dst_item",
        "cnt",
        (
            F.col("cnt").cast("double")
            / F.sum("cnt").over(w_src).cast("double")
        ).alias("prob"),
    )
