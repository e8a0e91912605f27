"""Property-based tests (SURVEY §5.5): operators cross-checked against
independent implementations (pandas merge_asof, plain join) and their
own invariants on hypothesis-generated data.

Each example spins Spark jobs, so examples are few and small —
the value is the generator's adversarial corner cases (ties, empties,
single-element groups), not volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (key, ts) event streams with deliberate tie pressure: few keys, few
# distinct timestamps.
events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=9),   # ts
    ),
    min_size=1,
    max_size=12,
)


@given(left=events, right=events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    from pyspark_recs.sql import asof_join

    # merge_asof requires unique right (key, ts): dedupe and attach a
    # value derived from (key, ts) so correctness is value-checkable.
    r_unique = sorted({(k, t) for k, t in right})
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, ts int, lid int"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 100 + t) for k, t in r_unique], "k int, rts int, val int"
    )
    got = {
        (r.k, r.ts, r.lid): r.val
        for r in asof_join(ldf, rdf, "k", "ts", "rts", ["val"]).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        [(k, t, k * 100 + t) for k, t in r_unique], columns=["k", "rts", "val"]
    ).sort_values("rts", kind="stable")
    ref = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    expected = {
        (int(r.k), int(r.ts), int(r.lid)): (None if pd.isna(r.val) else int(r.val))
        for r in ref.itertuples()
    }
    assert got == expected


@given(rows=events)
@settings(**SETTINGS)
def test_salted_join_matches_plain_join(spark, rows):
    from pyspark_recs.sql import salted_join

    left = spark.createDataFrame(
        [(k, t) for k, t in rows], "k int, payload int"
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in {k for k, _ in rows} if k != 1], "rk int, attr int"
    )
    plain = sorted(
        map(tuple, left.join(right, left.k == right.rk).collect())
    )
    salted = sorted(
        map(tuple, salted_join(left, right, "k", "rk", n_salts=3).collect())
    )
    assert salted == plain


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s", "t"]),
            st.integers(min_value=1, max_value=40),  # token count
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_pack_sequences_invariants(spark, docs):
    from pyspark_recs.llmops.textstats import pack_sequences

    capacity = 16
    df = spark.createDataFrame(
        [(i, grp, "w " * n) for i, (grp, n) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    out = sorted(
        (r.source, r.doc_id, r.n_tokens, r.bin_idx)
        for r in pack_sequences(df, capacity=capacity, group_col="source").collect()
    )
    for src in {s for s, _ in docs}:
        group = [r for r in out if r[0] == src]
        bins = [b for _, _, _, b in group]
        # bins are non-decreasing in doc_id order and start at 0
        assert bins == sorted(bins) and bins[0] == 0
        # each doc's bin equals its exclusive prefix sum // capacity
        cum = 0
        for _, _, n, b in group:
            assert b == cum // capacity
            cum += n


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=9), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=4,
    ),
    chunk=st.integers(min_value=2, max_value=8),
)
@settings(**SETTINGS)
def test_chunk_documents_invariants(spark, docs, chunk):
    """Chunking covers every token in order: concatenating each doc's
    chunks with the stride overlap removed reconstructs the document
    exactly, chunk sizes never exceed the budget, and indexes are
    dense from 0."""
    from pyspark_recs.llmops.textstats import chunk_documents

    stride = max(1, chunk - 2)
    df = spark.createDataFrame(
        [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk=chunk, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, toks in enumerate(docs):
        words = [f"w{t}" for t in toks]
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not words:
            assert got == []
            continue
        assert [r.chunk_idx for r in got] == list(range(len(got)))
        rebuilt = []
        for r in got:
            piece = r.chunk_text.split(" ")
            assert len(piece) == r.chunk_tokens <= chunk
            rebuilt.extend(piece[len(rebuilt) - r.chunk_idx * stride:])
        assert rebuilt == words


# Small random graphs with duplicate/self-loop pressure.
graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=20,
)


@given(edges=graph_edges)
@settings(**SETTINGS)
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from pyspark_recs.graph import triangle_counts

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}

    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in eset for n in e}
    brute: dict[int, int] = {}
    for x, y, z in combinations(sorted(nodes), 3):
        if {(x, y), (x, z), (y, z)} <= eset:
            for n in (x, y, z):
                brute[n] = brute.get(n, 0) + 1
    assert got == brute


# Tiny vocab corpora maximize heavy-hitter boundary pressure.
corpora = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=6,
)


@given(docs=corpora, k=st.integers(min_value=2, max_value=6))
@settings(**SETTINGS)
def test_heavy_hitters_match_bruteforce(spark, docs, k):
    from collections import Counter

    from pyspark_recs.llmops.textstats import heavy_hitters

    df = spark.createDataFrame(
        [(i, " ".join(words), "en", 0) for i, words in enumerate(docs)],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {r.token: r.cnt for r in heavy_hitters(df, k=k).collect()}
    counts = Counter(w for words in docs for w in words)
    total = sum(counts.values())
    brute = {t: c for t, c in counts.items() if c * k > total}
    assert got == brute
