"""Unit tests for the round-3 training-data operators: blocked edit
dedup, two-phase heavy hitters, rare-token scoring, next-item pairs,
funnel stages."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pyspark_recs.features.sequences import funnel_stages, next_item_pairs
from pyspark_recs.llmops.dedup import blocked_edit_pairs
from pyspark_recs.llmops.textstats import heavy_hitters, rare_token_score


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def test_blocked_edit_pairs_finds_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog again"
    docs = _docs(
        spark,
        [
            (1, base, "en", len(base)),
            (2, base.replace("quick", "quack"), "en", len(base)),
            # same text, different lang — blocking must exclude it
            (3, base, "fr", len(base)),
            # wildly different length bucket
            (4, "x" * 500, "en", 500),
        ],
    )
    pairs = blocked_edit_pairs(docs, prefix_len=48, max_dist=5).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    assert pairs[0].edit_dist == 1


def test_blocked_edit_pairs_never_crosses_blocks(spark):
    docs = _docs(
        spark,
        [(i, "same text", "en" if i % 2 else "de", 9) for i in range(8)],
    )
    pairs = blocked_edit_pairs(docs, max_dist=100).collect()
    for r in pairs:
        assert (r.doc_a % 2) == (r.doc_b % 2)  # lang block respected


def test_heavy_hitters_equals_bruteforce(spark):
    # 'a' appears 12/24 tokens, 'b' 6/24, the rest once each (6 tokens).
    text_rows = [
        (1, "a a a a a a b b b", "en", 0),
        (2, "a a a a a a b b b u1 u2 u3", "en", 0),
        (3, "u4 u5 u6", "en", 0),
    ]
    docs = _docs(
        spark, [(i, t, la, len(t)) for i, t, la, _ in text_rows]
    )
    k = 5  # threshold 24/5 = 4.8 tokens
    got = {r.token: r.cnt for r in heavy_hitters(docs, k=k).collect()}
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    total = toks.count()
    brute = {
        r.t: r.c
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
        if r.c * k > total
    }
    assert got == brute == {"a": 12, "b": 6}


def test_rare_token_score_hand_computed(spark):
    docs = _docs(
        spark,
        [
            (1, "a a b", "en", 5),  # counts: a=2,b=1 within corpus a=2,b=1,c=1
            (2, "c", "en", 1),
        ],
    )
    rows = {r.doc_id: r for r in rare_token_score(docs).collect()}
    # corpus total = 4 tokens; doc1 sum_cnt = 2+2+1 = 5, n_tokens 3
    assert rows[1].sum_cnt == 5 and rows[1].n_tokens == 3
    assert rows[1].mean_freq_ppm == 5 * 1_000_000 / (3 * 4)
    # doc2: c appears once in corpus of 4 -> 250000 ppm
    assert rows[2].mean_freq_ppm == 250_000.0
    assert not rows[2].flag_rare  # 250000 >= 2000


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, props string"
    )


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_next_item_pairs_history_order_and_bound(spark):
    ev = _events(
        spark,
        [
            (i, 1, _ts(f"2024-01-01 00:0{i}:00"), "click", f'{{"k": {10 + i}}}')
            for i in range(5)
        ],
    )
    rows = {r.event_id: r for r in next_item_pairs(ev, history_len=3).collect()}
    assert 0 not in rows  # first event has no history
    assert rows[1].history == "10" and rows[1].label == 11
    assert rows[4].history == "11,12,13" and rows[4].label == 14  # bounded to 3


def test_funnel_requires_strict_stage_order(spark):
    rows = [
        # user 1 completes the funnel in order
        (1, 1, _ts("2024-01-01 00:00:00"), "view", "{}"),
        (2, 1, _ts("2024-01-01 00:01:00"), "click", "{}"),
        (3, 1, _ts("2024-01-01 00:02:00"), "purchase", "{}"),
        # user 2 purchases BEFORE clicking — must not count as stage 3
        (4, 2, _ts("2024-01-01 00:00:00"), "view", "{}"),
        (5, 2, _ts("2024-01-01 00:00:30"), "purchase", "{}"),
        (6, 2, _ts("2024-01-01 00:01:00"), "click", "{}"),
        # user 3 never views — enters no stage
        (7, 3, _ts("2024-01-01 00:00:00"), "click", "{}"),
    ]
    got = {r.stage: r for r in funnel_stages(_events(spark, rows)).collect()}
    assert got["view"].n_users == 2
    assert got["click"].n_users == 2
    assert got["purchase"].n_users == 1
    assert got["purchase"].share_of_entry == 0.5


def test_triangle_counts_k4_plus_pendant(spark):
    from pyspark_recs.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant node 5
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 4), (3, 3)], "src long, dst long"  # dup + self-loop
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant 5 absent


def test_mode_per_group_two_phase_matches_window(spark):
    df = spark.createDataFrame(
        [("s1", "A"), ("s1", "A"), ("s1", "B"), ("s2", "B"), ("s2", "C")],
        "seg string, val string",
    )
    counted = df.groupBy("seg", "val").agg(F.count("*").alias("cnt"))
    best = counted.groupBy("seg").agg(F.max(F.struct("cnt", "val")).alias("b"))
    got = {r.seg: (r.b.val, r.b.cnt) for r in best.collect()}
    # s2 ties 1-1: higher string wins deterministically
    assert got == {"s1": ("A", 2), "s2": ("C", 1)}


def test_bpe_pair_counts_top_pair(spark):
    from pyspark_recs.llmops.textstats import bpe_pair_counts

    docs = _docs(
        spark,
        [
            (1, "a b a b a b", "en", 11),  # "a b"×3, "b a"×2
            (2, "a b c", "en", 5),         # "a b", "b c"
            (3, "solo", "en", 4),          # no pairs
        ],
    )
    rows = bpe_pair_counts(docs, top_n=2).collect()
    assert [(r.pair, r.cnt) for r in rows] == [("a b", 4), ("b a", 2)]


def test_hll_sketch_merge_matches_direct_sketch(spark):
    # Merging per-group sketches must estimate the same distinct count
    # as one sketch over the union (and land near the exact count).
    df = spark.createDataFrame(
        [(i % 3, i % 500) for i in range(5000)], "g int, v int"
    )
    leaf = df.groupBy("g").agg(F.hll_sketch_agg("v").alias("sk"))
    merged = leaf.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0].est
    assert merged == direct  # identical sketch state, not just close
    assert abs(merged - 500) <= 0.065 * 500


def test_incremental_lsh_blocks_near_duplicate_of_corpus(spark):
    from pyspark_recs.llmops.dedup import incremental_lsh_admit

    corpus_text = " ".join(f"w{i}" for i in range(40))
    near_dup = corpus_text.replace("w7", "x7")  # ~2 shingles differ
    fresh = " ".join(f"z{i}" for i in range(40))
    corpus = _docs(spark, [(1, corpus_text, "en", 0)])
    batch = _docs(spark, [(2, near_dup, "en", 0), (3, fresh, "en", 0)])
    got = {r.doc_id: r.admit for r in
           incremental_lsh_admit(batch, corpus).collect()}
    assert got == {2: False, 3: True}


def test_winnow_fingerprints_deterministic_and_bounded(spark):
    from pyspark_recs.llmops.textstats import winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog"
    docs = _docs(spark, [(1, text, "en", len(text)), (2, text, "en", len(text)),
                         (3, "short", "en", 5)])
    rows = {r.doc_id: r for r in
            winnow_fingerprints(docs, k=5, w=8).collect()}
    assert 3 not in rows  # below k+w-1 chars: no windows
    # identical docs -> identical fingerprint profile
    assert (rows[1].n_fingerprints, rows[1].min_fp, rows[1].max_fp) == (
        rows[2].n_fingerprints, rows[2].min_fp, rows[2].max_fp)
    # set size bounded by number of windows: m - w + 1 = (len-4) - 7
    assert 1 <= rows[1].n_fingerprints <= len(text) - 4 - 7
