"""Round-7 machinery, pinned by tests (VERDICT r7 item #6):

- ranked_by_range: exact global row_number equality vs the
  single-partition-window oracle, partition-count invariance, and
  input-layout invariance (the properties r19/r20/r36 lean on);
- _pin_fit_layout / train_content_model: bit-identical coefficients
  under different spark.sql.shuffle.partitions AND different upstream
  input layouts — the conf-independence claim round 6 got wrong and
  round 7 re-derived.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_recs.sql.transforms import categorify_dictionary, ranked_by_range
from pyspark_recs.workloads.common import unpersist_shared


def _collect_ranks(df, rank_col="rank"):
    return sorted((r["v"], r["t"], r[rank_col]) for r in df.collect())


@pytest.fixture()
def scrambled(spark):
    # Values with heavy duplication in the first key; (v, t) is total.
    df = spark.range(500).selectExpr(
        "cast(id % 23 as string) as v", "id as t"
    )
    yield df
    unpersist_shared(spark)


def test_ranked_by_range_matches_window_oracle(spark, scrambled):
    got = _collect_ranks(ranked_by_range(scrambled, ["v", "t"]))
    w = Window.orderBy("v", "t")
    want = _collect_ranks(
        scrambled.withColumn("rank", F.row_number().over(w).cast("long"))
    )
    assert got == want


def test_ranked_by_range_partition_count_invariant(spark, scrambled):
    base = _collect_ranks(ranked_by_range(scrambled, ["v", "t"]))
    for n_parts in (1, 2, 7, 32):
        got = _collect_ranks(
            ranked_by_range(scrambled, ["v", "t"], num_partitions=n_parts)
        )
        assert got == base, f"ranks moved at num_partitions={n_parts}"


def test_ranked_by_range_input_layout_invariant(spark, scrambled):
    base = _collect_ranks(ranked_by_range(scrambled, ["v", "t"]))
    relaid = scrambled.repartition(13).sortWithinPartitions(F.desc("t"))
    assert _collect_ranks(ranked_by_range(relaid, ["v", "t"])) == base


def test_ranked_by_range_contiguous_from_one(spark, scrambled):
    ranks = sorted(
        r["rank"] for r in ranked_by_range(scrambled, ["v", "t"]).collect()
    )
    assert ranks == list(range(1, 501))


def test_ntile_by_range_total_fast_path(spark, scrambled):
    """The ``total=`` fast path is trusted-or-else-wrong (ADVICE r10):
    pin that a CORRECT caller-supplied total (the only supported use,
    rs17's shape — a count taken from the same frame) yields buckets
    identical to the self-counting path, across bucket counts that do
    and don't divide the row count."""
    from pyspark_recs.sql.transforms import ntile_by_range

    n = scrambled.count()
    for k in (3, 7, 500, 1000):
        fast = sorted(
            (r["v"], r["t"], r["bucket"])
            for r in ntile_by_range(
                scrambled, ["v", "t"], k, total=n
            ).collect()
        )
        counted = sorted(
            (r["v"], r["t"], r["bucket"])
            for r in ntile_by_range(scrambled, ["v", "t"], k).collect()
        )
        assert fast == counted, f"total= fast path diverged at k={k}"


def test_categorify_dictionary_codes_follow_sort_order(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), (None,), ("c",), ("a",)], "v string"
    )
    got = {r["v"]: r["code"] for r in categorify_dictionary(df, "v").collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    unpersist_shared(spark)


# ------------------------------------------------------- trainer layout pin
def _tiny_train(spark, n=400):
    from pyspark_recs.model.content import FEATURE_COLS

    feat_exprs = [
        f"cast(pmod(id * {i + 3}, 17) as double) / 16.0 as {c}"
        for i, c in enumerate(FEATURE_COLS)
    ]
    return spark.range(n).selectExpr(
        "cast(id % 40 as int) as user_id",
        "cast(id % 29 as int) as item_id",
        "cast(pmod(id * 7, 2) as double) as label",
        *feat_exprs,
    )


def _fit_coeffs(spark, train, shuffle_parts):
    from pyspark_recs.model.content import train_content_model

    # conf AFTER building the frame (load_table re-applies RUNTIME_CONFS)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        _, model = train_content_model(train, max_iter=10)
        return tuple(model.coefficients.toArray().tolist()) + (
            float(model.intercept),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_pin_fit_layout_coefficients_conf_independent(spark):
    """The exact claim whose round-6 version was wrong: fitted
    coefficients must be BIT-identical across session shuffle confs
    and upstream input layouts (same core count)."""
    base = _fit_coeffs(spark, _tiny_train(spark), shuffle_parts=4)
    # different shuffle.partitions (the vanilla-200 driver scenario)
    assert _fit_coeffs(spark, _tiny_train(spark), 200) == base
    # different upstream physical layout: round-robin 3 parts
    assert _fit_coeffs(spark, _tiny_train(spark).repartition(3), 7) == base
    # adversarial pre-sort + skewed partitioning
    relaid = (
        _tiny_train(spark)
        .repartition(11, "item_id")
        .sortWithinPartitions(F.desc("label"))
    )
    assert _fit_coeffs(spark, relaid, 200) == base


def test_train_als_layout_total_order_with_duplicates(spark):
    """rating_col joined the pinned sort keys: duplicate (user, item)
    pairs with different ratings must still fit to identical factors
    regardless of input order (ADVICE r7 low item)."""
    from pyspark_recs.model.retrieval import train_als

    rows = [(u, i, r) for u in range(15) for i, r in ((u % 5, 2.0), (u % 5, 5.0), ((u + 1) % 5, 1.0))]
    df = spark.createDataFrame(rows, "user_id int, item_id int, n_purchases double")

    def factors(d):
        m = train_als(d, rank=4, max_iter=3, seed=7)
        return sorted(
            (r["id"], tuple(r["features"]))
            for r in m.itemFactors.collect()
        )

    a = factors(df.repartition(1).sortWithinPartitions(F.desc("n_purchases")))
    b = factors(df.repartition(9).sortWithinPartitions("item_id"))
    assert a == b
