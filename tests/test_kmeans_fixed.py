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
