"""Graph analytics over DataFrame edge lists: triangle counting (the
third graph primitive next to connected components in llmops/dedup.py
and the co-occurrence graph in workloads/recsys.py).

Scale design: triangle enumeration is two self-equi-joins over an
ORIENTED edge list — every edge is stored once as (lo, hi) with
lo < hi, so each triangle {a,b,c} is generated exactly once as
(a<b<c), never 6×. Both joins are hash equi-joins on a node id (one
shuffle each; co-partitioning the edge list on src makes the second
probe shuffle-free). The quadratic term is Σ_v deg(v)² from the wedge
join; the production refinement is degree orientation (point edges
from low-degree to high-degree endpoints, tie-break by id), which
bounds wedges per node by the arboricity — same plan shape, different
orientation rule, noted per-call-site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical (lo, hi) id-orientation with self-loop and duplicate
    removal — each undirected edge survives exactly once."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("lo"), hi.alias("hi"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts.

    Wedge generation: e1=(a,b) ⋈ e2=(b,c) on b with a<b<c (the
    orientation makes the a<b<c constraint free), then the closing-edge
    probe (a,c) ∈ E. Each triangle is found once and attributed to all
    three corners via a 3-way unpivot + groupBy — integer-exact, no
    windows, no collects.
    """
    e = orient_edges(edges, src, dst).cache()
    e1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b")
    closing = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = wedges.join(closing, ["a", "c"])
    corners = tris.selectExpr("stack(3, a, b, c) AS (node)")
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
