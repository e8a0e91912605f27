"""Unit tests for the fixed-point Lloyd's k-means trainer: exact
hand-computed centroids/inertia, and empty-cell centroid retention."""

from __future__ import annotations

from pyspark_recs.llmops.similarity import lloyd_kmeans_fixed

M = 1_000_000  # quantization scale


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


def test_kmeans_fixed_hand_computed(spark):
    vecs = _vecs(
        spark,
        [
            (0, [0.0, 0.0], 0),
            (1, [10.0, 10.0], 0),
            (2, [1.0, 1.0], 0),
            (3, [2.0, 2.0], 0),
            (4, [9.0, 9.0], 0),
            (5, [8.0, 8.0], 0),
        ],
    )
    rows = {
        r.cell_id: r
        for r in lloyd_kmeans_fixed(vecs, n_cells=2, iters=2).collect()
    }
    # seeds (0,0) and (10,10); both iterations assign {0,2,3} / {1,4,5}
    # -> centroids (1,1) and (9,9); inertia per cell = 2*(1e6)^2 * 2
    assert set(rows) == {0, 1}
    assert rows[0].n_vectors == 3 and rows[1].n_vectors == 3
    assert rows[0].inertia == 4 * M * M
    assert rows[1].inertia == 4 * M * M
    assert rows[0].centroid_l1 == 2 * M
    assert rows[1].centroid_l1 == 18 * M


def test_kmeans_fixed_empty_cell_keeps_centroid(spark):
    # duplicate seeds: every vector ties to cell 0 in round 1, so cell
    # 1 goes EMPTY and must keep its (0,0) centroid — which then wins
    # the origin points back in round 2
    vecs = _vecs(
        spark,
        [
            (0, [0.0, 0.0], 0),
            (1, [0.0, 0.0], 0),
            (2, [3.0, 3.0], 0),
        ],
    )
    rows = {
        r.cell_id: r
        for r in lloyd_kmeans_fixed(vecs, n_cells=2, iters=2).collect()
    }
    assert rows[0].n_vectors == 1 and rows[0].inertia == 0
    assert rows[0].centroid_l1 == 6 * M  # converged onto (3,3)
    assert rows[1].n_vectors == 2 and rows[1].inertia == 0
    assert rows[1].centroid_l1 == 0  # retained (0,0) through the empty round


def test_kmeans_fixed_randomized_differential(spark):
    """lloyd_kmeans_fixed vs an independent pure-Python Lloyd fold on
    seeded-random integer-valued vectors — ties, empty cells and
    floor-division updates included, not just the hand-picked cases."""
    import random

    rng = random.Random(20260816)
    n, dim, k, iters = 40, 4, 3, 2
    vecs = {
        i: [float(rng.randrange(-5, 6)) for _ in range(dim)]
        for i in range(n)
    }
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label long",
    )
    got = {
        r.cell_id: (r.n_vectors, r.inertia, r.centroid_l1)
        for r in lloyd_kmeans_fixed(df, n_cells=k, iters=iters).collect()
    }

    # independent reference in exact integer arithmetic
    import math

    q = {i: [round(x * M) for x in v] for i, v in vecs.items()}
    cents = {c: list(q[c]) for c in range(k)}  # lowest-id seeds

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cents[c])), c)
                for c in cents
            )
            out[i] = best  # (dist, cell)
        return out

    for _ in range(iters):
        a = assign()
        sums = {}
        for i, (_, c) in a.items():
            s, cnt = sums.get(c, ([0] * dim, 0))
            s = [x + y for x, y in zip(s, q[i])]
            sums[c] = (s, cnt + 1)
        for c, (s, cnt) in sums.items():
            cents[c] = [math.floor(x / cnt) for x in s]
    final = assign()
    expect = {}
    for c in cents:
        members = [i for i, (_, cc) in final.items() if cc == c]
        expect[c] = (
            len(members),
            sum(final[i][0] for i in members),
            sum(abs(x) for x in cents[c]),
        )
    assert got == expect
