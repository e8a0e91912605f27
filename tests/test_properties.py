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


# value streams for the Holt fold: dyadic-friendly integers so the
# Python reference and the JVM fold hit identical doubles by
# construction (the s17 exactness claim), plus tie pressure on ts.
holt_streams = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=9),    # ts tie pressure
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=14,
)


@given(rows=holt_streams)
@settings(**SETTINGS)
def test_holt_fold_matches_python_reference(spark, rows):
    """The s17 struct-accumulator fold must equal a plain Python Holt
    recurrence bit for bit for ANY ordered stream (α=β=½ keeps every
    step IEEE-identical) — including single-event users and heavy ts
    ties (broken by event_id)."""
    df = spark.createDataFrame(
        [
            (i, u, float(ts * 1_000_000), float(v))
            for i, (u, ts, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts_us double, value double",
    )
    arr = F.array_sort(
        F.collect_list(F.struct("ts_us", "event_id", "value"))
    )
    folded = (
        df.groupBy("user_id")
        .agg(F.transform(arr, lambda s: s["value"]).alias("vals"))
        .selectExpr(
            "user_id",
            "aggregate(slice(vals, 2, size(vals) - 1),"
            " named_struct('l', vals[0], 'b', CAST(0.0 AS DOUBLE)),"
            " (acc, x) -> named_struct("
            "   'l', 0.5D * x + 0.5D * (acc.l + acc.b),"
            "   'b', 0.5D * ((0.5D * x + 0.5D * (acc.l + acc.b))"
            "        - acc.l) + 0.5D * acc.b)) AS st",
        )
        .selectExpr("user_id", "st.l AS level", "st.b AS trend")
    )
    got = {r.user_id: (r.level, r.trend) for r in folded.collect()}

    expect = {}
    ordered = sorted(
        ((u, ts, i, v) for i, (u, ts, v) in enumerate(rows)),
        key=lambda t: (t[0], t[1], t[2]),
    )
    for u, _, _, v in ordered:
        x = float(v)
        if u not in expect:
            expect[u] = (x, 0.0)
        else:
            lv, b = expect[u]
            nl = 0.5 * x + 0.5 * (lv + b)
            expect[u] = (nl, 0.5 * (nl - lv) + 0.5 * b)
    assert got == expect  # bit-exact, every key


@given(
    docs=st.lists(
        st.text(
            alphabet="ab cd",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_cdc_chunks_partition_invariant_and_accounts_all_chars(spark, docs):
    """Content-defined chunk accounting must be identical under any
    input partitioning (the dedup keep-first order is (doc, position),
    never physical order), and chunk lengths must partition each doc's
    characters exactly."""
    from pyspark_recs.llmops.dedup import content_defined_chunks

    rows = [(i, t) for i, t in enumerate(docs)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    ra = sorted(map(tuple, content_defined_chunks(a).collect()))
    rb = sorted(map(tuple, content_defined_chunks(b).collect()))
    assert ra == rb
    by_doc = {r[0]: r for r in ra}
    for i, t in rows:
        if len(t) == 0:
            assert i not in by_doc  # empty docs chunk to nothing
        else:
            # total_len is folded into mean via integer division; check
            # the partition property through n_chunks * mean <= len and
            # the remainder bound
            _, n_chunks, _, _, mean_len = by_doc[i]
            assert n_chunks >= 1
            assert n_chunks * mean_len <= len(t) < (mean_len + 1) * n_chunks + n_chunks
