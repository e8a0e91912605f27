"""Similarity search over embedding columns.

Two tiers (SURVEY §2.7 M4/M7 generalized):
- ``cosine_topk_bruteforce``: exact scan — the correctness baseline and
  the oracle-checkable path. Dot products are computed with fixed-point
  integer folds so results are bit-identical across engines and
  partitionings.
- ``lsh_topk``: MLlib BucketedRandomProjectionLSH — the 100 TB path
  (probe only candidate buckets instead of all n·m pairs).

Scale notes for brute force: queries are broadcast (small side), the
candidate scan is embarrassingly parallel, and per-query top-k uses a
window over the query partition — with Q queries and N candidates the
shuffle is O(Q·k) after per-task pre-pruning (WindowGroupLimit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# Fixed-point scale for dot-product folds (products ≤ ~0.5 elementwise
# for unit-norm vectors → terms ≤ 5e11 < 2^53; 64-dim sums ≤ 3e13).
_DOT_SCALE = 1e12


def _fixed_dot(a, b):
    """Exact integer-fold dot product of two float-array columns."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(_DOT_SCALE) + F.lit(0.5)
        ).cast("long"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v).cast(
            "double"
        )
        / F.lit(_DOT_SCALE)
    )


def _fixed_dot_long(a, b):
    """Fixed-point dot product kept as the raw int64 fold (no final
    division) — the form MaxSim sums and maxes over so every
    intermediate stays exact integer arithmetic."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(_DOT_SCALE) + F.lit(0.5)
        ).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def maxsim_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_tokens: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR'20): each vector is treated as ``n_tokens`` contiguous
    sub-vectors ("token embeddings") and a pair scores
    ``MaxSim(q, d) = Σ_t max_s dot(q_t, d_s)`` — the multi-vector
    upgrade of :func:`cosine_topk_bruteforce`'s single-dot scoring
    that keeps per-token matching signal (the modern retrieval stack's
    reranker-quality scorer at near-bi-encoder cost).

    Exactness: every token dot is the fixed-point int64 fold; max and
    sum stay on int64 (bounded by n_tokens · dim · 2^40 « 2^63), and
    only the final score divides back to double — so ranking and
    scores are bit-identical across engines and partitionings.

    Scale: queries broadcast; the token expansion NEVER becomes rows,
    so there is no n_tokens× shuffle blow-up; per-query top-k prunes
    through WindowGroupLimit exactly like the brute-force path. Two
    scorer impls, identical bit-for-bit (a differential test pins
    them):

    - ``impl='arrow'`` (default): one vectorized pandas UDF computes
      the quantized product tensor P[b,t,s,d] = floor(q·c·1e12 + .5)
      batch-wise in numpy (float64 multiplies match JVM doubles
      exactly), then int64 sum/max/sum — Spark higher-order-function
      lambdas are interpreted per element, so at N·Q pairs ×
      n_tokens² dots the Arrow batch path is ~3× faster despite the
      column transfer (measured at sf0.1: 1.0s vs 3.1s warm).
    - ``impl='expr'``: pure JVM nested higher-order-function
      expression — zero Python, the right choice when the pair count
      is small or Python workers are unavailable.

    For billion-doc corpora, front either impl with an IVF/LSH
    candidate stage and apply MaxSim only to the survivors (the
    standard ColBERT serving topology).

    Output: query_id, neighbor_id, maxsim (double), rank (1-based);
    self-matches excluded, ties broken by neighbor_id ascending.
    """
    # Dim guard (ADVICE r9/r10, final form r11): on dim % n_tokens != 0
    # the arrow impl raised a numpy reshape error while the expr impl
    # silently truncated trailing dims — one clear contract for both.
    # The guard lives INSIDE each kernel (a per-batch length check in
    # the arrow UDF; an assert_true folded into the expr score), so it
    # validates EVERY row — ragged vectors, query/candidate dim
    # mismatch, non-divisible dims — with zero extra Spark jobs (the
    # round-10 eager min/max aggregate cost a full scan of both vector
    # columns per call, +0.5 s at sf0.1). The error surfaces at action
    # time, like every other lazy-plan failure.
    if impl == "arrow":
        scored = _maxsim_pairs_arrow(
            candidates, queries, n_tokens, id_col, vec_col
        )
    else:
        scored = _maxsim_pairs_expr(
            candidates, queries, n_tokens, id_col, vec_col
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("maxsim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _maxsim_pairs_expr(
    candidates, queries, n_tokens, id_col, vec_col
) -> DataFrame:
    """Pure-JVM MaxSim pair scorer: token views as ``slice``
    expressions, the score as one nested higher-order fold."""

    def toks(col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda t: F.slice(
                col, t * (F.size(col) / n_tokens).cast("int") + 1,
                (F.size(col) / n_tokens).cast("int"),
            ),
        )

    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        toks(F.col(vec_col)).alias("ctoks"),
        F.size(F.col(vec_col)).alias("_cd"),
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        toks(F.col(vec_col)).alias("qtoks"),
        F.size(F.col(vec_col)).alias("_qd"),
    )
    pairs = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    ctoks = F.col("ctoks")
    score_long = F.aggregate(
        F.col("qtoks"),
        F.lit(0).cast("long"),
        lambda acc, qt: acc
        + F.array_max(F.transform(ctoks, lambda ct: _fixed_dot_long(qt, ct))),
    )
    # Per-row dim guard folded into the score (0.0 when the asserts
    # pass): assert_true raises with the clear contract message
    # instead of letting the slice views silently truncate. The guard
    # is the LEFT operand of the + below — binary-arithmetic codegen
    # short-circuits the right side when the left is NULL, and a
    # mismatched pair's raw score IS null (zip_with over unequal
    # lengths), so score-first would skip the assert exactly on the
    # rows it exists for.
    guard = F.coalesce(
        F.assert_true(
            F.col("_cd") == F.col("_qd"),
            F.lit(
                "maxsim_topk: ragged or mismatched vector dims across "
                "queries/candidates — all embeddings must share one dim"
            ),
        ).cast("double"),
        F.assert_true(
            F.col("_qd") % n_tokens == 0,
            F.lit(
                f"maxsim_topk: vector dim is not divisible by "
                f"n_tokens={n_tokens} — token sub-vectors must tile "
                "the embedding exactly"
            ),
        ).cast("double"),
        F.lit(0.0),
    )
    return pairs.select(
        "query_id",
        "neighbor_id",
        (guard + score_long.cast("double") / F.lit(_DOT_SCALE)).alias(
            "maxsim"
        ),
    )


def _maxsim_pairs_arrow(
    candidates, queries, n_tokens, id_col, vec_col
) -> DataFrame:
    """Arrow-vectorized MaxSim pair scorer: flat vectors cross the
    UDF boundary (no nested-list Arrow churn), numpy builds the
    quantized product tensor per batch and reduces it int64-exactly —
    floor(float64 product · 1e12 + 0.5) elementwise, THEN sum over
    dim, max over candidate tokens, sum over query tokens: the
    identical arithmetic to the JVM fold, in C loops."""
    from pyspark.sql.functions import pandas_udf

    nt = n_tokens
    scale = _DOT_SCALE  # captured: the arrow and expr paths must share it

    @pandas_udf("long")
    def maxsim_long(qv: pd.Series, cv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int64")
        # Per-batch dim guard (the kernel-side half of maxsim_topk's
        # contract): every pair's query and candidate must share one
        # dim divisible by n_tokens. Any ragged/mismatched pair lands
        # in SOME batch (the cross join pairs all queries with all
        # candidates), so the per-batch union of lengths catches it.
        lens = {len(v) for v in qv} | {len(v) for v in cv}
        if len(lens) > 1:
            raise ValueError(
                "maxsim_topk: ragged or mismatched vector dims across "
                "queries/candidates — all embeddings must share one dim"
            )
        d = lens.pop()
        if d % nt:
            raise ValueError(
                f"maxsim_topk: vector dim {d} is not divisible by "
                f"n_tokens={nt} — token sub-vectors must tile the "
                "embedding exactly"
            )
        q = np.vstack(qv.to_numpy()).astype(np.float64)
        c = np.vstack(cv.to_numpy()).astype(np.float64)
        b, dim = q.shape
        sub = dim // nt
        qt = q.reshape(b, nt, sub)
        ct = c.reshape(b, nt, sub)
        # P[b, t, s, d] = q_t[d] * c_s[d], quantized per element —
        # computed in bounded row chunks: the whole-batch 4-D tensor is
        # ~100 MB transient at the 10k-row Arrow batch default, and
        # those allocations intermittently stalled the Python worker
        # for seconds (measured at sf0.1: run times alternating
        # 0.8 s / 3–27 s; chunked, a flat ~0.5 s). The chunk size is
        # DERIVED from the tensor shape (ADVICE r12): each chunk row
        # costs nt*nt*sub*8 bytes for the float64 product tensor
        # (the int64 quantized copy briefly doubles that peak), so
        # the ~4 MB bound holds for any embedding configuration
        # instead of only the shape the old hardcoded 1024 was tuned
        # on (it reproduces chunk=1024 exactly for the l91 shape:
        # nt=8, sub=8). Arithmetic is per-pair and chunk-independent,
        # so results are identical for any chunk size (guide §4.2/§5).
        score = np.empty(b, dtype=np.int64)
        target_bytes = 4 << 20
        chunk = max(1, target_bytes // (nt * nt * sub * 8))
        for s in range(0, b, chunk):
            e = min(s + chunk, b)
            prod = qt[s:e, :, None, :] * ct[s:e, None, :, :]
            fp = np.floor(prod * scale + 0.5).astype(np.int64)
            score[s:e] = fp.sum(axis=3).max(axis=2).sum(axis=1)
        return pd.Series(score)

    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    )
    pairs = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    return pairs.select(
        "query_id",
        "neighbor_id",
        (
            maxsim_long(F.col("qv"), F.col("cv")).cast("double")
            / F.lit(_DOT_SCALE)
        ).alias("maxsim"),
    )


def cosine_topk_bruteforce(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, cos_sim, rank (1-based), excluding
    self-matches; ties broken by neighbor_id ascending.
    """
    # Norms depend on one side only — compute once per vector BEFORE the
    # pair expansion (at N candidates × Q queries this removes 2/3 of
    # the array arithmetic from the quadratic term).
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias("norm_c"),
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias("norm_q"),
    )
    pairs = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    dot = _fixed_dot(F.col("cand_vec"), F.col("query_vec"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot / (F.col("norm_c") * F.col("norm_q"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def crossmodal_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    item_id: str = "doc_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Text→image retrieval ranking (the reference scores CLIP text
    embeddings against item-image embeddings and takes the best matches,
    `src/app/pred_inspector.py:94-108`): per query, top-k items by
    cosine. Both sides are unit-norm by encoder contract, so cosine =
    dot product — one fixed-point fold per pair, no norm recompute.

    Scale: the prompt side is tiny (user queries) → broadcast; the item
    scan is embarrassingly parallel and per-query top-k prunes to O(Q·k)
    rows per task before the window shuffle (WindowGroupLimit). For
    billion-item catalogs swap the scan for ``ivf_topk`` blocking with
    the same scoring expression.
    """
    pairs = items.select(
        F.col(item_id), F.col(vec_col).alias("iv")
    ).crossJoin(
        F.broadcast(
            queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
        )
    )
    scored = pairs.select(
        query_id,
        item_id,
        _fixed_dot(F.col("iv"), F.col("qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    sign_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bit blocking.

    The dedup-family member for embedding columns (generalizes the
    reference's CLIP-vector similarity, `src/app_utils.py:10-26` +
    `src/app/pred_inspector.py:103-108`, into a near-dup detector).

    Bucket key = the sign pattern of the first ``sign_bits`` dimensions
    — an axis-aligned signed-projection LSH. Vectors with cosine near 1
    agree on almost every coordinate sign, so true near-dups collide;
    exact fixed-point cosine then confirms inside each bucket. The
    self-join is keyed on the bucket (≤ 2^sign_bits cells), never
    all-pairs: the pair expansion is Σ_b n_b² instead of N². At 100 TB
    raise ``sign_bits`` (cells double per bit, buckets shrink) and add
    multi-probe over low-|value| dimensions for recall. Fully
    deterministic → DuckDB-oracle-checkable.

    Output: id_a < id_b, cos_sim ≥ threshold (within-bucket pairs only).
    """
    bucket = F.aggregate(
        F.zip_with(
            F.slice(F.col(vec_col), 1, sign_bits),
            F.sequence(F.lit(0), F.lit(sign_bits - 1)),
            lambda x, i: F.when(
                x >= 0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    vecs = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        bucket.alias("bucket"),
        F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    a = vecs.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = vecs.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _fixed_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select(
        "id_a", "id_b", cos.alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def assign_cells(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Coarse-quantizer cell assignment shared by the IVF family
    (``ivf_topk``'s inverted file, ``semantic_dedup``'s clusters,
    ``cluster_balanced_sample``'s balancing cells): each vector goes to
    its highest-cosine centroid (tie-break lowest cell_id), computed as
    a broadcast cross-score + max(struct) partial aggregate — never a
    window over the N×C expansion.

    Returns (id_col, vec_col, vnorm, cell_id). Defaults to the
    deterministic lowest-id centroids (oracle-checkable); pass
    ``kmeans_centroids(...)`` for production cells. Callers that share
    one corpus materialize THIS table once (workloads' session-shared
    ``_cell_assign16``) — at 100 TB the assignment is the artifact you
    partition/bucket the vector table by."""
    if centroids is None:
        centroids = (
            vectors.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec")
            )
        )
    cents = F.broadcast(
        centroids.select(
            "cell_id",
            "cvec",
            F.sqrt(_fixed_dot(F.col("cvec"), F.col("cvec"))).alias("cnorm"),
        )
    )
    vecs = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias("vnorm"),
    )
    scored = vecs.crossJoin(cents).select(
        id_col,
        vec_col,
        "vnorm",
        "cell_id",
        (
            _fixed_dot(F.col(vec_col), F.col("cvec"))
            / (F.col("vnorm") * F.col("cnorm"))
        ).alias("ccos"),
    )
    return (
        scored.groupBy(id_col, vec_col, "vnorm")
        .agg(
            F.max(F.struct(F.col("ccos"), (-F.col("cell_id")).alias("nc")))
            .alias("best")
        )
        .select(id_col, vec_col, "vnorm", (-F.col("best.nc")).alias("cell_id"))
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then call two corpus items semantic duplicates iff
    their cosine ≥ ``threshold`` AND they land in the same cluster —
    the clustering is what makes web-scale semantic dedup tractable,
    turning the N² similarity matrix into Σ_c n_c² within-cell blocks
    (the IVF sibling of ``embedding_neardup_pairs``' sign-bit blocks;
    the paper dedups LAION/C4 exactly this way). Keep rule: the lowest
    id in each duplicate relation survives (keep-first, deterministic —
    the paper's keep-farthest-from-centroid is a one-line orderBy swap).

    Output: one row per vector — (id, cell_id, status keep|drop) — the
    corpus-filter shape downstream training pipelines consume.

    Scale: centroid assignment is a broadcast cross-score + max(struct)
    partial aggregate (no window over the N×C expansion); the pair join
    is keyed on cell_id, never all-pairs; `drop` derivation is a
    distinct + broadcastable semi-join. Defaults to the deterministic
    lowest-id centroid stand-in (oracle-checkable); pass
    ``kmeans_centroids(...)`` for quality-fit cells in production, or
    ``assigned`` (an :func:`assign_cells` table, possibly session-
    shared) to skip re-assignment entirely.
    """
    if assigned is None:
        assigned = assign_cells(
            vectors, n_cells, id_col, vec_col, centroids
        )
    a = assigned.select(
        "cell_id",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("vnorm").alias("na"),
    )
    b = assigned.select(
        "cell_id",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("vnorm").alias("nb"),
    )
    cos = _fixed_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_d", F.lit(1)), id_col, "left_outer")
        .select(
            id_col,
            "cell_id",
            F.when(F.col("_d").isNotNull(), F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("status"),
        )
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate nearest neighbors (the inverted-file scale
    path, complementing ``lsh_topk``). ``assigned`` (an
    :func:`assign_cells` table over ``candidates``, possibly
    session-shared) skips rebuilding the inverted file; the default
    centroids of both MUST match.

    Coarse quantizer: each candidate is assigned to its single highest-
    cosine centroid (the inverted file); each query probes its ``nprobe``
    closest cells and scores exactly only within them — the scan touches
    ~nprobe/n_cells of the corpus instead of all of it. At 100 TB:
    partition/bucket the candidate table BY cell_id so a probe join
    prunes partitions, and size n_cells ≈ √N with k-means centroids.

    Pass ``centroids`` — a (cell_id, cvec) DataFrame, e.g. from
    ``kmeans_centroids`` — for quality-fit cells in production. The
    default (the ``n_cells`` lowest-id candidate vectors) is a
    deterministic stand-in that keeps the whole operator
    DuckDB-oracle-checkable, unlike the seeded-model LSH path.

    Output: query_id, neighbor_id, cos_sim, rank — same contract as
    ``cosine_topk_bruteforce`` (self-matches excluded).
    """
    if centroids is None:
        centroids = (
            candidates.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec")
            )
        )
    cents = centroids.select(
        "cell_id",
        "cvec",
        F.sqrt(_fixed_dot(F.col("cvec"), F.col("cvec"))).alias("cnorm"),
    )

    def _scored_cells(df: DataFrame, out_id: str, out_vec: str):
        side = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias(
                out_vec + "_norm"
            ),
        )
        ccos = _fixed_dot(F.col(out_vec), F.col("cvec")) / (
            F.col(out_vec + "_norm") * F.col("cnorm")
        )
        return side.crossJoin(F.broadcast(cents)).select(
            out_id, out_vec, out_vec + "_norm", "cell_id", ccos.alias("ccos")
        )

    # Candidate assignment is argmax over the broadcast centroids, so a
    # partial-aggregating max(struct) (map-side combine, shuffle of N
    # rows) replaces a window over the N×C pair expansion. Tie-break
    # matches the window form: highest ccos, then lowest cell_id.
    best = F.max(
        F.struct(
            F.col("ccos"), (-F.col("cell_id")).alias("neg_cell"), "cell_id"
        )
    ).alias("best")
    if assigned is not None:
        inv_file = assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            F.col("vnorm").alias("nv_norm"),
            "cell_id",
        )
    else:
        inv_file = (
            _scored_cells(candidates, "neighbor_id", "nv")
            .groupBy("neighbor_id")
            .agg(
                best,
                F.first("nv").alias("nv"),
                F.first("nv_norm").alias("nv_norm"),
            )
            .select(
                "neighbor_id",
                "nv",
                "nv_norm",
                F.col("best.cell_id").alias("cell_id"),
            )
        )
    # Queries keep nprobe cells — a top-k, still via window (Q rows is
    # the small side; WindowGroupLimit pre-prunes per task).
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    probes = (
        _scored_cells(queries, "query_id", "qv")
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .drop("ccos", "crank")
    )

    scored = (
        probes.join(inv_file, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _fixed_dot(F.col("qv"), F.col("nv"))
                / (F.col("qv_norm") * F.col("nv_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
    max_candidates_per_query: int = 4096,
) -> DataFrame:
    """Approximate top-k via random-projection LSH (the scale path:
    candidate generation by bucket equi-join instead of a full cross
    product).

    Uses MLlib's BucketedRandomProjectionLSH only to fit the seeded
    projections; the join itself is a hand-rolled (table, bucket)
    equi-join so candidate volume is bounded: after pair-dedup, each
    query keeps at most ``max_candidates_per_query`` candidates before
    exact rescoring. ``approxSimilarityJoin`` with an infinite radius
    would instead score *every* colliding pair — a pathological bucket
    (all-zero vectors, a heavy hub) degenerates to near-all-pairs.
    Here the worst case is queries × max_candidates exact distances,
    by construction.

    Distances are Euclidean; for unit-normalized embeddings the ranking
    is equivalent to cosine. Not oracle-checkable (model-seeded), tested
    by recall-vs-bruteforce in tests/.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    cand = candidates.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    qry = queries.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cand)

    def _buckets(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        # hashes is array<vector> (one 1-dim vector per table); explode to
        # (table_idx, bucket) so colliding rows meet on an equi-join key.
        return model.transform(df).select(
            F.col("id").alias(id_out),
            F.col("vec").alias(vec_out),
            F.posexplode("hashes").alias("table_idx", "hvec"),
        ).select(
            id_out,
            vec_out,
            "table_idx",
            vector_to_array("hvec")[0].cast("long").alias("bucket"),
        )

    qb = _buckets(qry, "query_id", "qvec")
    cb = _buckets(cand, "neighbor_id", "nvec")
    pairs = (
        qb.join(cb, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # Dedup pairs colliding in several tables (one shuffle, keeps the
        # vectors via first() instead of a join-back).
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("qvec").alias("qvec"), F.first("nvec").alias("nvec"))
    )
    # Safety valve: bound exact-rescore work per query. The cap is far
    # above k, so recall is unchanged unless a bucket truly degenerates.
    wcap = Window.partitionBy("query_id").orderBy(F.asc("neighbor_id"))
    capped = (
        pairs.withColumn("cand_rank", F.row_number().over(wcap))
        .filter(F.col("cand_rank") <= max_candidates_per_query)
    )
    dist = F.sqrt(
        _fixed_dot(F.col("qvec"), F.col("qvec"))
        + _fixed_dot(F.col("nvec"), F.col("nvec"))
        - 2 * _fixed_dot(F.col("qvec"), F.col("nvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        capped.select("query_id", "neighbor_id", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _lsh_plan(
    in_dim: int,
    num_hash_tables: int,
    bucket_length: float,
    seed: str,
) -> tuple[list, int, int]:
    """Shared deterministic-LSH parameters: md5-derived ±1 hyperplanes
    plus the fixed-point bucket divisor W and positive offset OFF (a
    multiple of W) that turn truncating integer division — which both
    Spark's ``div`` and DuckDB's ``//`` do toward zero — into true
    floor division for possibly-negative projections."""
    signs = rademacher_signs(in_dim, num_hash_tables, seed)
    w = int(round(bucket_length * 1e12))
    off = w * 500_000
    return signs, w, off


def _lsh_proj_expr(vec_col: str, signs_row: list) -> str:
    lit = "array(" + ",".join(str(s) for s in signs_row) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {lit}, (x, s) ->"
        " CAST(floor(CAST(x AS DOUBLE) * s * 1e12 + 0.5) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def lsh_topk_deterministic(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: str = "lsh",
    max_candidates_per_query: int = 4096,
    in_dim: int = 64,
) -> DataFrame:
    """Random-projection LSH top-k with DETERMINISTIC md5-derived ±1
    hyperplanes — same candidate-generation shape as :func:`lsh_topk`
    (per-table bucket equi-join, pair dedup, bounded exact rescore) but
    every number is engine-reproducible, so the whole operator is
    DuckDB-oracle-checkable (`lsh_topk_oracle_sql` is the twin).

    Bucketing is exact integer math: the projection onto each
    hyperplane is a fixed-point ±-sum of the vector's quantized
    components (the l46 Rademacher trick), and the bucket id is floor
    division of that BIGINT by W = bucket_length·1e12 — computed as
    ``(proj + OFF) div W − OFF/W`` with a positive offset so Spark's
    and DuckDB's truncate-toward-zero integer division agree with
    floor on negative projections. Distances are Euclidean over the
    same fixed-point dot products (for unit-norm embeddings the
    ranking equals cosine).

    Scale: identical to lsh_topk — candidate volume is bounded by the
    bucket equi-join plus the per-query cap, never all-pairs; the
    hyperplanes are literals compiled into the plan (no fit job, no
    broadcast of a model).

    ``in_dim`` MUST match the embedding dimension (the hyperplanes are
    compiled for exactly that many components). A mismatched vector is
    a hard runtime error, not a silent drop: ``zip_with`` against a
    shorter/longer hyperplane would otherwise null the projection and
    make the row vanish — an engine/oracle divergence the guard turns
    into a diagnosable failure. Share the same value with
    :func:`lsh_topk_oracle_sql`.
    """
    signs, w_fixed, off = _lsh_plan(
        in_dim, num_hash_tables, bucket_length, seed
    )
    off_div_w = off // w_fixed

    def _buckets(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        projs = ", ".join(
            f"({_lsh_proj_expr(vec_col, signs[t])} + {off}L)"
            f" div {w_fixed}L - {off_div_w}L"
            for t in range(num_hash_tables)
        )
        proj_arr = F.when(
            F.size(F.col(vec_col)) == in_dim, F.expr(f"array({projs})")
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"lsh_topk_deterministic: vector dimension != {in_dim}"
                    " (pass in_dim= matching the embedding column)"
                )
            )
        )
        return df.select(
            F.col(id_col).alias(id_out),
            F.col(vec_col).alias(vec_out),
            F.posexplode(proj_arr).alias("table_idx", "bucket"),
        )

    qb = _buckets(queries, "query_id", "qvec")
    cb = _buckets(candidates, "neighbor_id", "nvec")
    pairs = (
        qb.join(cb, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("qvec").alias("qvec"), F.first("nvec").alias("nvec"))
    )
    wcap = Window.partitionBy("query_id").orderBy(F.asc("neighbor_id"))
    capped = pairs.withColumn(
        "cand_rank", F.row_number().over(wcap)
    ).filter(F.col("cand_rank") <= max_candidates_per_query)
    dist = F.sqrt(
        _fixed_dot(F.col("qvec"), F.col("qvec"))
        + _fixed_dot(F.col("nvec"), F.col("nvec"))
        - 2 * _fixed_dot(F.col("qvec"), F.col("nvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        capped.select("query_id", "neighbor_id", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk_oracle_sql(
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: str = "lsh",
    max_candidates_per_query: int = 4096,
    query_pred: str = "vec_id < 10",
    in_dim: int = 64,
) -> str:
    """DuckDB twin of :func:`lsh_topk_deterministic` over the
    ``embeddings`` view (queries = rows matching ``query_pred``).
    ``in_dim`` must be the value the Spark side was called with."""
    signs, w_fixed, off = _lsh_plan(
        in_dim, num_hash_tables, bucket_length, seed
    )
    off_div_w = off // w_fixed
    fd = (
        "CAST(list_sum(list_transform(list_zip({a}, {b}), "
        "p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)"
        " * 1e12 + 0.5) AS BIGINT))) AS DOUBLE) / 1e12"
    )
    bucket_rows = []
    for t in range(num_hash_tables):
        lit = "[" + ",".join(str(s) for s in signs[t]) + "]"
        proj = (
            "list_sum(list_transform(list_zip(embedding, "
            f"{lit}), p -> CAST(floor(CAST(p[1] AS DOUBLE) * p[2] * 1e12"
            " + 0.5) AS BIGINT)))"
        )
        bucket_rows.append(
            f"SELECT vec_id, {t} AS table_idx,"
            f" ({proj} + {off}) // {w_fixed} - {off_div_w} AS bucket"
            " FROM embeddings"
        )
    buckets = " UNION ALL ".join(bucket_rows)
    return f"""
WITH b AS ({buckets}),
qb AS (SELECT * FROM b WHERE {query_pred}),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qb q JOIN b c ON q.table_idx = c.table_idx AND q.bucket = c.bucket
  WHERE q.vec_id <> c.vec_id),
capped AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY neighbor_id) AS cand_rank
    FROM pairs)
  WHERE cand_rank <= {max_candidates_per_query}),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         sqrt(({fd.format(a='q.embedding', b='q.embedding')})
              + ({fd.format(a='n.embedding', b='n.embedding')})
              - 2 * ({fd.format(a='q.embedding', b='n.embedding')}))
           AS dist
  FROM capped p
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings n ON n.vec_id = p.neighbor_id)
SELECT query_id, neighbor_id, dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, neighbor_id) AS rank
  FROM scored)
WHERE rank <= {k}
"""


def rademacher_signs(in_dim: int, out_dim: int, seed: str = "jl") -> list:
    """Deterministic ±1 Rademacher matrix for :func:`jl_project`,
    derived from md5 so any engine/language reproduces it — the random
    projection analog of the Categorify stable-dictionary discipline.
    Returns ``out_dim`` rows of ``in_dim`` signs."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{seed}:{k}:{i}".encode()).digest()[0] & 1
            else -1
            for i in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def jl_project(
    vectors: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: d → k dims via a ±1
    Rademacher matrix, y_k = Σ_i x_i·r_ki / √k — pairwise distances
    preserved within (1±ε) for k = O(log N / ε²). The third member of
    the vector-compression trio (l25 scalar quantization shrinks bits
    per dim, l42 matryoshka truncates trained prefixes, this works on
    ANY embedding without training). Output is scalar columns y_0..y_k
    (oracle- and parquet-friendly).

    Scale: pure projection — no shuffle, no UDF; each output dim is a
    fixed-point ±-sum over the input array (exact integer adds of
    quantized values, so results are bit-identical across engines; the
    sign matrix is an md5-derived literal both sides embed). The √k
    division is one double op at the end.
    """
    import math

    signs = rademacher_signs(in_dim, out_dim, seed)
    inv = 1.0 / math.sqrt(float(out_dim))
    cols = [F.col(id_col)]
    for k in range(out_dim):
        lit = "array(" + ",".join(str(s) for s in signs[k]) + ")"
        q = (
            f"aggregate(zip_with({vec_col}, {lit}, (x, s) ->"
            " CAST(floor(CAST(x AS DOUBLE) * s * 1e12 + 0.5) AS BIGINT)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        cols.append(
            (F.expr(q).cast("double") / F.lit(1e12) * F.lit(inv)).alias(
                f"y_{k}"
            )
        )
    return vectors.select(*cols)


def jl_project_oracle_sql(
    out_dim: int = 8, in_dim: int = 64, seed: str = "jl"
) -> str:
    """DuckDB twin of :func:`jl_project` over the ``embeddings`` view."""
    import math

    signs = rademacher_signs(in_dim, out_dim, seed)
    inv = 1.0 / math.sqrt(float(out_dim))
    cols = ["vec_id"]
    for k in range(out_dim):
        lit = "[" + ",".join(str(s) for s in signs[k]) + "]"
        cols.append(
            "(CAST(list_sum(list_transform(list_zip(embedding, "
            f"{lit}), p -> CAST(floor(CAST(p[1] AS DOUBLE) * p[2] * 1e12"
            " + 0.5) AS BIGINT))) AS DOUBLE) / 1e12 "
            f"* {inv!r}) AS y_{k}"
        )
    return "SELECT " + ", ".join(cols) + " FROM embeddings"


def embedding_covariance(
    vectors: DataFrame,
    vec_col: str = "embedding",
    scale: float = 1e12,
    dim: int | None = None,
) -> DataFrame:
    """Exact d×d covariance of an embedding column in ONE distributed
    pass — the sufficient statistic for PCA / whitening / Mahalanobis
    over a corpus (dimensionality reduction before ANN is the classic
    16× index-size lever next to l25's quantization and l42's MRL).

    Upper triangle only (i ≤ j, 1-based), cov_ij = E[x_i x_j] −
    E[x_i]E[x_j]. Cross terms are generated JVM-side per row (d²/2
    structs from one nested transform — no self-join), then fixed-point
    summed so the matrix is bit-identical across engines and
    partitionings (the workloads.common discipline; here the moment
    sums ARE the shuffle, ≤ d²/2 partial aggregates per partition, so
    shuffle size is independent of row count).

    Precision budget: |x_i·x_j|·scale·N must stay < 2^63 — at the
    default 1e12 and unit-scale embeddings that is ~10^6 rows per
    aggregate; drop ``scale`` to 1e9 for billion-row corpora (still
    nano-exact).

    Pass ``dim`` (the known embedding width) to use the vectorized
    one-pass KERNEL plan (r12-opt, guide §4.2): a single ``mapInPandas``
    computes, per partition, the d²/2 partial moment sums, the d partial
    first-moment sums AND the partial row count in one NumPy pass —
    per-element ``floor(float64(x)·float64(y)·scale + 0.5)`` is the
    IDENTICAL IEEE-754 sequence the JVM expression evaluated, summed in
    int64 (exact), so every aggregate is bit-equal to the expression
    plan (pinned by tests/test_llmops.py kernel-vs-expression test).
    This replaced the flat-explode plan (per-row BIGINT triangle +
    posexplode + hash agg + position-map join + a SECOND scan for the
    first moments): the 10M+ exploded rows never exist — each partition
    ships exactly d²/2 partial rows (i, j, sq, sx_i, sx_j, n) into ONE
    map-side-combined shuffle, and the final operator is a single
    groupBy projection: no joins, no filters, no second scan, so the
    kernel subtree has exactly one consumer and executes once (a
    marker-row + filtered-consumers draft re-ran the Python kernel per
    consumer because Catalyst pushes filters below the aggregate,
    splitting the would-be-reused exchange — visible in the plan, hence
    this layout). Whole-query at sf0.1 on 64-dim: 2.9 s (struct
    explode) → 2.3 s (flat explode) → ~0.6 s (kernel). Row-chunked at
    256 rows so the per-chunk outer-product buffer stays ~8 MB at
    d = 64 regardless of Arrow batch size. A row whose array size
    differs from ``dim`` is a hard error raised in-kernel, not a
    silent mis-labeling.
    """
    mult = F.lit(scale)
    if dim is not None:
        import numpy as np
        import pandas as pd

        d = int(dim)
        iu0, iu1 = np.triu_indices(d)
        # (kept tiny + deterministic so the closure ships cheaply)
        i_lab = (iu0 + 1).astype("int32")
        j_lab = (iu1 + 1).astype("int32")

        def partial_moments(batches):
            sq = np.zeros((d, d), dtype=np.int64)
            sx = np.zeros(d, dtype=np.int64)
            n = 0
            for pdf in batches:
                col = pdf[vec_col]
                for lo in range(0, len(col), 256):
                    chunk = col.iloc[lo : lo + 256]
                    A = np.array(
                        [np.asarray(v, dtype=np.float64) for v in chunk]
                    )
                    if A.size == 0:
                        continue
                    if A.ndim != 2 or A.shape[1] != d:
                        raise ValueError(
                            f"embedding_covariance: vector dimension != {d}"
                        )
                    # identical IEEE sequence to the former JVM
                    # expression: (x*y)*scale + 0.5, floor, int64
                    q = np.floor(
                        (A[:, :, None] * A[:, None, :]) * scale + 0.5
                    )
                    sq += q.sum(axis=0).astype(np.int64)
                    sx += np.floor(A * scale + 0.5).sum(axis=0).astype(
                        np.int64
                    )
                    n += A.shape[0]
            if n == 0:
                return  # empty partition: contribute nothing
            yield pd.DataFrame(
                {
                    "i": i_lab,
                    "j": j_lab,
                    "sq": sq[iu0, iu1],
                    "sxi": sx[iu0],
                    "sxj": sx[iu1],
                    "n": np.full(len(i_lab), np.int64(n)),
                }
            )

        partials = vectors.select(vec_col).mapInPandas(
            partial_moments,
            schema="i int, j int, sq long, sxi long, sxj long, n long",
        )
        nd = F.col("n").cast("double")
        return (
            partials.groupBy("i", "j")
            .agg(
                F.sum("sq").alias("sq"),
                F.sum("sxi").alias("sxi"),
                F.sum("sxj").alias("sxj"),
                F.sum("n").alias("n"),
            )
            .select(
                "i",
                "j",
                "n",
                (
                    F.col("sq").cast("double") / mult / nd
                    - (F.col("sxi").cast("double") / mult / nd)
                    * (F.col("sxj").cast("double") / mult / nd)
                ).alias("cov"),
            )
        )
    else:
        terms = vectors.select(
            F.explode(
                F.expr(
                    f"flatten(transform({vec_col}, (x, i) ->"
                    f" transform(slice({vec_col}, i + 1, size({vec_col})),"
                    " (y, k) -> struct(i + 1 AS i, i + k + 1 AS j,"
                    " CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
                    f" * {scale!r} + 0.5) AS BIGINT) AS q))))"
                )
            ).alias("t")
        )
        moments = terms.groupBy(
            F.col("t.i").alias("i"), F.col("t.j").alias("j")
        ).agg(F.sum("t.q").alias("sq"))
        firsts = vectors.select(
            F.posexplode(vec_col).alias("i0", "x")
        ).select(
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("x").cast("double") * mult + F.lit(0.5))
            .cast("long")
            .alias("qx"),
        ).groupBy("i").agg(
            F.sum("qx").alias("sx"), F.count(F.lit(1)).alias("n")
        )
    mi = F.broadcast(firsts.selectExpr("i", "sx AS sxi", "n"))
    mj = F.broadcast(firsts.selectExpr("i AS j", "sx AS sxj"))
    nd = F.col("n").cast("double")
    return (
        moments.join(mi, "i")
        .join(mj, "j")
        .select(
            "i",
            "j",
            "n",
            (
                F.col("sq").cast("double") / mult / nd
                - (F.col("sxi").cast("double") / mult / nd)
                * (F.col("sxj").cast("double") / mult / nd)
            ).alias("cov"),
        )
    )


def pca_projection(cov: DataFrame, top_k: int) -> "list[list[float]]":
    """Eigendecompose a (i, j, cov) upper-triangle covariance table into
    the top-``top_k`` principal directions (rows of the returned
    projection matrix, eigenvalue-descending).

    The d×d matrix is driver-sized by construction (d ≪ 10³ for any
    embedding model) — collecting it is the correct move, same as
    k-means centers; the EXPENSIVE pass is `embedding_covariance`,
    which stays distributed. Apply the projection with a zip_with dot
    per component (JVM-side), or fold it into `ivf_topk` candidates to
    shrink vectors before indexing."""
    import numpy as np

    rows = cov.collect()
    d = max(r.j for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        m[r.i - 1, r.j - 1] = r.cov
        m[r.j - 1, r.i - 1] = r.cov
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][:top_k]
    return [[float(x) for x in vecs[:, k]] for k in order]


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Fit k-means coarse centroids for ``ivf_topk`` (the production
    quantizer; SURVEY §2.7 M4's LSH escape hatch generalized to IVF).
    Returns (cell_id, cvec). Seeded but iterative float math, so
    pipelines using it take the rows-only correctness path."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return vectors.sparkSession.createDataFrame(
        centers, "cell_id long, cvec array<double>"
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-vector min-max scalar quantization to int codes in
    [0, levels] (levels=255 → int8 storage): code = round((x - vmin) /
    scale) with scale = (vmax - vmin) / levels. Emits (vmin, vmax,
    codes) — everything needed to dequantize (x̂ = vmin + code·scale,
    max error scale/2).

    At 100 TB this is the embedding-storage lever: float32 → int8 is 4×
    less scan I/O and shuffle for every ANN/dedup pass over the corpus,
    at a reconstruction error bounded per vector (not per corpus, since
    the range is per-vector). Constant-vector edge: scale = 0 → all
    codes 0, dequantizes exactly to vmin.

    Pure projection (no shuffle); exact double arithmetic with a
    half-up round, so codes are bit-identical across engines and
    partitionings — the quantized corpus is reproducible, which matters
    when shards are re-encoded at different times on different clusters.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin = F.array_min(vec)
    vmax = F.array_max(vec)
    scale = (vmax - vmin) / F.lit(float(levels))
    codes = F.when(
        vmax == vmin, F.transform(vec, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            vec,
            lambda x: F.floor((x - vmin) / scale + F.lit(0.5)).cast("int"),
        )
    )
    return df.select(
        F.col(id_col),
        vmin.alias("vmin"),
        vmax.alias("vmax"),
        codes.alias("codes"),
    )


def pq_encode(
    vectors: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Product quantization encode (Jégou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): split each vector into
    ``n_subspaces`` contiguous sub-vectors, assign each sub-vector to
    its nearest codebook entry, and emit one small integer code per
    subspace plus the total quantization error. With 4 subspaces × 16
    codes a 64-dim float vector compresses 256 B → 2 B (128×), and ANN
    scans compare against precomputed asymmetric-distance tables
    instead of raw floats — the memory-bound trick behind IVF-PQ
    indexes (the l15 IVF lists store exactly these codes at scale).

    Codebooks default to the deterministic lowest-id corpus vectors
    (same stand-in as semantic_dedup/ivf_topk, keeping the operator
    oracle-checkable); pass per-subspace ``kmeans_centroids`` output
    for production quality.

    Determinism: sub-distances are per-term fixed-point quantized
    BIGINTs (floor((a−b)²·1e12 + 0.5), summed exactly), and argmin
    tie-breaks on the smaller code id by packing (dist, code) into ONE
    BIGINT — ``dist_q · n_codes + code_id`` — whose min is the
    lexicographic (dist, code) min because ``code_id < n_codes``.
    Bit-identical across engines and partitionings.

    Scale: the candidate expansion is N × (n_subspaces · n_codes) rows
    against a BROADCAST codebook, collapsed by ONE map-side-combined
    groupBy(id) carrying 4 LONG min aggregates — no window, no second
    shuffle; at 10⁹ vectors the exchange moves one ~40-byte row per
    vector. The packed min keeps the aggregate HASH-based: min over a
    STRUCT plans as SortAggregate (two extra sorts flanking the
    exchange, r13-opt plan diff), and the int64 headroom is ample —
    dist_q ≤ subdim·(Δ²·1e12), so even |Δ| ≤ 20 over 16 terms packs
    under 2⁵⁹.
    """
    if centroids is None:
        from pyspark.sql import Window

        # code_id = rank of the centroid's source id (deterministic);
        # the codebook is n_codes rows, so the single-task window is a
        # driver-trivial sort, not a scale concern.
        centroids = (
            vectors.orderBy(F.asc(id_col))
            .limit(n_codes)
            .select(
                F.col(vec_col).alias("cvec"),
                (F.row_number().over(Window.orderBy(F.asc(id_col))) - 1).alias(
                    "code_id"
                ),
            )
        )
    cents = centroids.select(
        "code_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                lambda m: F.struct(
                    m.alias("m"),
                    F.slice(
                        F.col("cvec"),
                        m * (F.size("cvec") / F.lit(n_subspaces)).cast("int")
                        + 1,
                        (F.size("cvec") / F.lit(n_subspaces)).cast("int"),
                    ).alias("csub"),
                ),
            )
        ).alias("cs"),
    ).select("code_id", "cs.m", "cs.csub")
    vecs = vectors.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                lambda m: F.struct(
                    m.alias("m"),
                    F.slice(
                        F.col(vec_col),
                        m * (F.size(vec_col) / F.lit(n_subspaces)).cast("int")
                        + 1,
                        (F.size(vec_col) / F.lit(n_subspaces)).cast("int"),
                    ).alias("vsub"),
                ),
            )
        ).alias("vs"),
    ).select(id_col, "vs.m", "vs.vsub")
    dist_q = F.aggregate(
        F.zip_with(
            F.col("vsub"),
            F.col("csub"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(1e12)
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    packed = (
        dist_q * F.lit(n_codes).cast("long")
        + F.col("code_id").cast("long")
    )
    scored = vecs.join(F.broadcast(cents), "m").select(
        id_col, "m", packed.alias("packed")
    )
    aggs = [
        F.min(F.when(F.col("m") == m, F.col("packed"))).alias(f"b{m}")
        for m in range(n_subspaces)
    ]
    collapsed = scored.groupBy(id_col).agg(*aggs)
    code_cols = [
        (F.col(f"b{m}") % F.lit(n_codes).cast("long"))
        .cast("int")
        .alias(f"code_{m}")
        for m in range(n_subspaces)
    ]
    # exact integer unpack of the distance halves (div, never float /)
    err = sum(
        (F.expr(f"b{m} div {n_codes}L") for m in range(n_subspaces)),
        F.lit(0).cast("long"),
    )
    return collapsed.select(
        id_col,
        *code_cols,
        (err.cast("double") / F.lit(1e12)).alias("sq_error"),
    )


def ivfpq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_centroids: DataFrame | None = None,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors (Jégou et al. 2011; the
    FAISS billion-vector path): the IVF coarse quantizer prunes the
    scan to ``nprobe``/``n_cells`` of the corpus, and within probed
    cells distances are computed against PQ CODES (2 B per vector via
    ``pq_encode``) instead of raw floats — asymmetric distance
    computation (ADC), where each query precomputes a
    (subspace × code) → squared-distance table and a candidate's
    distance is just ``n_subspaces`` table lookups summed.

    Both codebooks default to deterministic lowest-id corpus vectors
    (the stand-in that keeps the operator DuckDB-oracle-checkable —
    same convention as ``ivf_topk``/``pq_encode``); pass
    ``kmeans_centroids`` output for production quality.

    Determinism: ADC entries are the same fixed-point BIGINT
    sub-distances as ``pq_encode`` (floor((a−b)²·1e12 + 0.5) per term,
    summed exactly), so ranking and tie-breaks (smaller distance, then
    smaller neighbor id) are bit-identical across engines.

    Scale: the inverted file carries (neighbor_id, cell_id, 4 codes) —
    ~10 B/vector, 25× less I/O than raw 64-d floats; the ADC table is
    Q · n_subspaces · n_codes rows and BROADCASTS; the only
    corpus-sized work is the probe equi-join on cell_id and one
    map-side-combined (query, neighbor) sum of 4 rows. At 10⁹ vectors
    you bucket the code table by cell_id so probes prune partitions.

    Output: (query_id, neighbor_id, adc_dist, rank), self-excluded.
    """
    if coarse_centroids is None:
        coarse_centroids = (
            candidates.orderBy(F.asc(id_col))
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec")
            )
        )
    if codebook is None:
        codebook = (
            candidates.orderBy(F.asc(id_col))
            .limit(n_codes)
            .select(
                F.col(vec_col).alias("cvec"),
                (
                    F.row_number().over(Window.orderBy(F.asc(id_col))) - 1
                ).alias("code_id"),
            )
        )

    cents = coarse_centroids.select(
        "cell_id",
        "cvec",
        F.sqrt(_fixed_dot(F.col("cvec"), F.col("cvec"))).alias("cnorm"),
    )

    def _cell_scores(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        side = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.sqrt(_fixed_dot(F.col(vec_col), F.col(vec_col))).alias("vnorm"),
        )
        ccos = _fixed_dot(F.col(out_vec), F.col("cvec")) / (
            F.col("vnorm") * F.col("cnorm")
        )
        return side.crossJoin(F.broadcast(cents)).select(
            out_id, out_vec, "cell_id", ccos.alias("ccos")
        )

    # Inverted file: argmax cell per candidate via partial-aggregating
    # max(struct) — no window over the N×C expansion.
    inv_file = (
        _cell_scores(candidates, "neighbor_id", "nv")
        .groupBy("neighbor_id")
        .agg(F.max(F.struct("ccos", (-F.col("cell_id")).alias("ncell"))).alias("b"))
        .select("neighbor_id", (-F.col("b.ncell")).alias("cell_id"))
    )
    # PQ codes for every candidate (shares the codebook with the ADC
    # table below).
    codes = pq_encode(
        candidates,
        n_subspaces=n_subspaces,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        centroids=codebook,
    ).select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"code_{m}") for m in range(n_subspaces)],
    )

    # Query ADC tables: (query_id, m, code_id) → exact BIGINT sq-dist.
    sub_len = (F.size("cvec") / F.lit(n_subspaces)).cast("int")
    book_subs = codebook.select(
        "code_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                lambda m: F.struct(
                    m.alias("m"),
                    F.slice(F.col("cvec"), m * sub_len + 1, sub_len).alias(
                        "csub"
                    ),
                ),
            )
        ).alias("bs"),
    ).select("code_id", "bs.m", "bs.csub")
    qsub_len = (F.size(vec_col) / F.lit(n_subspaces)).cast("int")
    q_subs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_subspaces - 1)),
                lambda m: F.struct(
                    m.alias("m"),
                    F.slice(F.col(vec_col), m * qsub_len + 1, qsub_len).alias(
                        "qsub"
                    ),
                ),
            )
        ).alias("qs"),
    ).select("query_id", "qs.m", "qs.qsub")
    dist_q = F.aggregate(
        F.zip_with(
            F.col("qsub"),
            F.col("csub"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(1e12)
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    adc = q_subs.join(F.broadcast(book_subs), "m").select(
        "query_id", "m", "code_id", dist_q.alias("dist_q")
    )

    # Query → nprobe cells (WindowGroupLimit over the small Q×C side).
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    probes = (
        _cell_scores(queries, "query_id", "qv")
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "cell_id")
    )

    # Probe join → per-pair code unpivot → ADC lookups summed exactly.
    # Both joins broadcast the PROVABLY small side (probes is
    # Q·nprobe rows; codes is one 10-byte row per candidate): after
    # the window/aggregate subtrees Spark's size estimates are wildly
    # pessimistic and it planned SortMergeJoins — 4 exchanges + 4
    # sorts for sides this small (guide §3.1 "use an explicit
    # broadcast hint when you know a side is small";
    # plans/r13/l58_ivfpq_search_before.txt). The hints replace the
    # cascade with two BroadcastHashJoins and leave the corpus-sized
    # inverted file un-shuffled. At 10⁹ vectors codes outgrows the
    # broadcast budget — bucket it by cell_id instead (docstring).
    pairs = (
        F.broadcast(probes).join(inv_file, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(codes), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.col(f"code_{m}").alias("code_id"),
                        )
                        for m in range(n_subspaces)
                    ]
                )
            ).alias("mc"),
        )
        .select("query_id", "neighbor_id", "mc.m", "mc.code_id")
    )
    summed = (
        pairs.join(F.broadcast(adc), ["query_id", "m", "code_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dist_q").alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_q"), F.asc("neighbor_id")
    )
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("adc_q").cast("double") / F.lit(1e12)).alias("adc_dist"),
            "rank",
        )
    )


def cluster_balanced_sample(
    vectors: DataFrame,
    cap_per_cell: int = 40,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Cluster-balanced corpus sampling: assign every embedding to its
    semantic cell, then keep at most ``cap_per_cell`` vectors per cell,
    chosen by deterministic hash rank — the diversity-preserving
    sampler (DataComp/SemDeDup-style cluster balancing) that keeps the
    long tail of topics a uniform sample would drown under the dominant
    cluster. Selection is md5-rank-keyed, so the sample is reproducible
    across engines, re-runs and cluster sizes, and RESUMABLE: a
    vector's keep/drop decision depends only on corpus membership, not
    arrival order.

    Output: (id, cell_id, cell_n, kept) for every vector.

    Scale: cell assignment is the broadcast cross-score + max(struct)
    partial aggregate shared with ivf_topk/semantic_dedup; the per-cell
    rank is row_number + filter, which Spark executes as
    WindowGroupLimit — each task keeps ≤ cap rows per cell before the
    exchange. Defaults to deterministic lowest-id centroids
    (oracle-checkable); pass ``kmeans_centroids`` output in production,
    or ``assigned`` (an :func:`assign_cells` table, possibly session-
    shared) to skip re-assignment.
    """
    from pyspark_recs.llmops.hashing import md5_long

    if assigned is None:
        assigned = assign_cells(vectors, n_cells, id_col, vec_col, centroids)
    assigned = assigned.select(id_col, "cell_id")
    wr = Window.partitionBy("cell_id").orderBy(
        F.asc("hkey"), F.asc(id_col)
    )
    wc = Window.partitionBy("cell_id")
    return (
        assigned.withColumn(
            "hkey", md5_long(F.concat_ws("_", F.lit("cbs"), F.col(id_col)))
        )
        .withColumn("cell_n", F.count(F.lit(1)).over(wc))
        .withColumn("hrank", F.row_number().over(wr))
        .select(
            id_col,
            "cell_id",
            "cell_n",
            (F.col("hrank") <= cap_per_cell).alias("kept"),
        )
    )


def lloyd_kmeans_fixed(
    vectors: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Lloyd's k-means in FIXED-POINT arithmetic — the hash-checkable
    sibling of :func:`kmeans_centroids` (whose pyspark.ml float
    iterations force the rows-only correctness path). Vectors are
    quantized once to bigint (``floor(x*scale + 0.5)``), every
    distance is an exact integer sum of squared differences, and each
    centroid update is ``floor(sum / count)`` evaluated as an exact
    double division of exactly-representable integers — so any engine
    replaying the same unrolled iterations lands on the SAME centroids
    bit-for-bit. Seeds are the ``n_cells`` lowest-id vectors
    (deterministic, the ``assign_cells`` convention); assignment ties
    break on lowest cell_id; a cell that loses all members keeps its
    previous centroid.

    Returns per-cell training stats after ``iters`` Lloyd rounds plus
    a final assignment: (cell_id, n_vectors, inertia, centroid_l1) —
    inertia is the exact integer within-cell squared distance at
    quantized scale, centroid_l1 an order-free centroid checksum.

    Scale: assignment is a broadcast cross-score + min(struct) partial
    aggregate (never a window over the N×C expansion); the update is
    one posexplode → (cell, dim) combiner-friendly sum — shuffle rows
    = C·d regardless of corpus size; per-iteration cost is one pass.
    At 100 TB you run exactly this loop on a sample, publish the
    centroid table as an artifact, and ``assign_cells`` the full
    corpus against it.
    """
    q = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).cast("long"),
        ).alias("q"),
    )
    from pyspark_recs.workloads.common import (
        PersistedRddHandle,
        persisted_ids,
        register_persisted,
        release_persisted_ids,
    )

    spark = vectors.sparkSession
    # q feeds iters+1 assignment passes and the returned plan —
    # registered so session teardown releases it (the r89 lint class).
    q = register_persisted(q.cache())
    prev_ckpt_ids: set = set()
    cents = (
        q.orderBy(F.asc("vec_id"))
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("q").alias("cvec"))
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        dist = F.aggregate(
            F.zip_with(
                F.col("q"), F.col("cvec"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = q.crossJoin(F.broadcast(cents_df)).select(
            "vec_id", F.col("cell_id"), dist.alias("dist")
        )
        return (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cell_id")).alias("m"))
            .select(
                "vec_id",
                F.col("m.dist").alias("dist"),
                F.col("m.cell_id").alias("cell_id"),
            )
        )

    for _ in range(iters):
        assigned = assign(cents).join(q, "vec_id")
        upd = (
            assigned.select(
                "cell_id", F.posexplode("q").alias("idx", "v")
            )
            .groupBy("cell_id", "idx")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .select(
                "cell_id",
                "idx",
                F.floor(F.col("s").cast("double") / F.col("cnt"))
                .cast("long")
                .alias("cv"),
            )
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "cv"))),
                    lambda s: s["cv"],
                ).alias("cvec")
            )
        )
        cents = (
            cents.select("cell_id", F.col("cvec").alias("prev"))
            .join(upd.withColumnRenamed("cvec", "new"), "cell_id", "left")
            .select(
                "cell_id", F.coalesce("new", "prev").alias("cvec")
            )
        )
        # C rows by construction (the l71 merge-table precedent):
        # truncate the lineage so iteration r+1's plan doesn't
        # re-execute every earlier assign/update round. The superseded
        # set is the PREVIOUS round's checkpoint ids, tracked by a
        # snapshot diff taken immediately around each localCheckpoint
        # call (ADVICE r11: a session-wide description filter would
        # force-unpersist a concurrent operator's non-recomputable
        # checkpoint blocks); released only after the new round's
        # block materializes (eager=True), since the new checkpoint
        # computes FROM the old plan. The FINAL round's block backs
        # the returned plan, so it registers for session teardown via
        # an RDD-level handle instead.
        pre_ckpt = persisted_ids(spark)
        cents = cents.localCheckpoint(eager=True)
        new_ckpt_ids = persisted_ids(spark) - pre_ckpt
        release_persisted_ids(spark, prev_ckpt_ids)
        prev_ckpt_ids = new_ckpt_ids
    register_persisted(PersistedRddHandle(spark, prev_ckpt_ids))

    final = assign(cents)
    stats = final.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("dist").alias("inertia"),
    )
    l1 = F.aggregate(
        F.col("cvec"),
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.abs(v),
    )
    zero = F.lit(0).cast("long")
    return (
        cents.join(stats, "cell_id", "left")
        .select(
            "cell_id",
            F.coalesce("n_vectors", zero).alias("n_vectors"),
            F.coalesce("inertia", zero).alias("inertia"),
            l1.alias("centroid_l1"),
        )
    )
