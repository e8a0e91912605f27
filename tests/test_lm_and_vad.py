"""Unit tests for the round-9 quality-signal operators: bigram-LM
fluency scoring, DSIR hashed-n-gram importance, and energy-gate VAD
segmentation (window energies + gaps-and-islands)."""

from __future__ import annotations

import hashlib

from pyspark_recs.llmops.multimodal import (
    audio_window_energies,
    vad_segments,
)
from pyspark_recs.llmops.textstats import bigram_lm_score, dsir_importance


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


def test_bigram_lm_score_hand_computed(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a c", "en", 7),
            (2, "a b", "en", 3),
            (3, "z", "en", 1),  # < 2 tokens: no bigrams, no row
        ],
    )
    rows = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    # corpus bigrams: 'a b' x2 (doc1+doc2), 'b a' x1, 'a c' x1
    # contexts: a -> 3, b -> 1
    # q('a b') = 2e6 div 3 = 666_666; q('b a') = 1e6; q('a c') = 333_333
    assert set(rows) == {1, 2}
    assert rows[1].n_bigrams == 3
    assert rows[1].q_sum == 666_666 + 1_000_000 + 333_333
    assert rows[1].mean_cond_ppm == 1_999_999 / 3
    assert rows[2].n_bigrams == 1 and rows[2].q_sum == 666_666
    assert not rows[2].flag_disfluent  # 666_666 >= 34_000


def test_bigram_lm_flags_shuffled_text(spark):
    # ten fluent copies of the same sentence vs one with the word
    # order scrambled: the scrambled doc hits corpus-rare transitions
    fluent = "the cat sat on the mat"
    docs = _docs(
        spark,
        [(i, fluent, "en", len(fluent)) for i in range(10)]
        + [(99, "mat the on sat cat the", "en", len(fluent))],
    )
    rows = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert rows[99].mean_cond_ppm < rows[0].mean_cond_ppm


def _bucket(token: str, n_buckets: int = 4096) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % n_buckets


def test_dsir_importance_hand_computed(spark):
    docs = _docs(
        spark,
        [
            (1, "a a b", "en", 5),
            (2, "b c", "fr", 3),
        ],
    )
    # independent recomputation with real md5 buckets (collision-safe
    # by construction: we bucket the same way the engine does)
    toks = {1: ["a", "a", "b"], 2: ["b", "c"]}
    langs = {1: "en", 2: "fr"}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for d, ws in toks.items():
        for w in ws:
            b = _bucket(w)
            cr[b] = cr.get(b, 0) + 1
            if langs[d] == "en":
                ct[b] = ct.get(b, 0) + 1
    s = {b: ((ct.get(b, 0) + 1) * 1_000_000) // (c + 1) for b, c in cr.items()}
    rows = {r.doc_id: r for r in dsir_importance(docs).collect()}
    for d, ws in toks.items():
        expect = sum(s[_bucket(w)] for w in ws)
        assert rows[d].n_tokens == len(ws)
        assert rows[d].s_sum == expect
        assert rows[d].mean_ratio_ppm == expect / len(ws)
    # the en doc must look more target-like than the fr doc
    assert rows[1].mean_ratio_ppm > rows[2].mean_ratio_ppm


def test_vad_segments_islands(spark):
    win = spark.createDataFrame(
        [(1, "ok", i, e) for i, e in enumerate(
            [40_000, 50_000, 10_000, 35_000, 36_000, 37_000]
        )]
        + [(2, "ok", i, 100) for i in range(3)],
        "doc_id long, status string, win_idx int, win_abs long",
    )
    rows = {r.doc_id: r for r in vad_segments(win, 32_000).collect()}
    r1 = rows[1]
    assert (r1.n_windows, r1.n_active) == (6, 5)
    assert (r1.n_segments, r1.longest_run) == (2, 3)
    assert r1.active_abs_sum == 40_000 + 50_000 + 35_000 + 36_000 + 37_000
    r2 = rows[2]
    assert (r2.n_windows, r2.n_active) == (3, 0)
    assert (r2.n_segments, r2.longest_run, r2.active_abs_sum) == (0, 0, 0)


def test_audio_window_energies_round_trip(spark):
    from pyspark_recs.llmops.wav import encode_wav

    # 64 samples: 32 at +100 then 32 at -50 -> windows [3200, 1600]
    pcm = b"".join(
        v.to_bytes(2, "little", signed=True)
        for v in [100] * 32 + [-50] * 32
    )
    good = encode_wav(8000, 1, pcm)
    payloads = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30]))],
        "doc_id long, payload binary",
    )
    rows = audio_window_energies(payloads, window=32).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    ok = sorted(by_doc[1], key=lambda r: r.win_idx)
    assert [(r.win_idx, r.win_abs) for r in ok] == [(0, 3200), (1, 1600)]
    assert all(r.status == "ok" for r in ok)
    (err,) = by_doc[2]
    assert err.status == "decode_error"
    assert err.win_idx is None and err.win_abs is None


def test_duplicate_text_spans_islands(spark):
    from pyspark_recs.llmops.dedup import duplicate_text_spans

    docs = _docs(
        spark,
        [
            # d1/d2 share exactly the 5-gram 'a1..a5' at pos 0
            (1, "a1 a2 a3 a4 a5 f g h", "en", 15),
            (2, "a1 a2 a3 a4 a5 x y z", "en", 15),
            # d4/d5 share 'b1..b5' AND 'c1..c5'; in d4 the two starts
            # are 5 apart (touching windows -> ONE span covering the
            # whole doc), in d5 the 'Z' pushes them 6 apart (TWO spans)
            (4, "b1 b2 b3 b4 b5 c1 c2 c3 c4 c5", "en", 19),
            (5, "b1 b2 b3 b4 b5 Z c1 c2 c3 c4 c5", "en", 21),
            # no cross-doc 5-gram at all
            (3, "n1 n2 n3 n4 n5 n6 n7", "en", 13),
        ],
    )
    rows = {r.doc_id: r for r in duplicate_text_spans(docs).collect()}
    assert (rows[1].n_spans, rows[1].covered_tokens, rows[1].max_span_tokens) == (1, 5, 5)
    assert rows[1].dup_ppm == (5 * 1_000_000) // 8
    assert rows[1].flag_trim  # 625000 > 500000
    assert (rows[4].n_spans, rows[4].covered_tokens, rows[4].max_span_tokens) == (1, 10, 10)
    assert rows[4].dup_ppm == 1_000_000
    assert (rows[5].n_spans, rows[5].covered_tokens, rows[5].max_span_tokens) == (2, 10, 5)
    assert (rows[3].n_spans, rows[3].covered_tokens, rows[3].dup_ppm) == (0, 0, 0)
    assert not rows[3].flag_trim


def test_audio_downsample_floor_semantics(spark):
    from pyspark_recs.llmops.multimodal import downsample_audio_payloads
    from pyspark_recs.llmops.wav import encode_wav

    # pairs: (100,101) -> floor(201/2) = 100; (-5,-6) -> floor(-11/2)
    # = -6 (FLOOR, not truncation toward zero: -5 would be the
    # cross-engine bug the oracle would catch)
    pcm = b"".join(
        v.to_bytes(2, "little", signed=True) for v in [100, 101, -5, -6]
    )
    good = encode_wav(8000, 1, pcm)
    payloads = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30]))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in downsample_audio_payloads(payloads, factor=2).collect()
    }
    r1 = rows[1]
    assert (r1.status, r1.sample_rate, r1.n_frames) == ("ok", 4000, 2)
    assert r1.amp_sum == 100 + (-6)
    assert r1.amp_abs_sum == 100 + 6
    assert rows[2].status == "decode_error"


def test_duplicate_text_spans_empty_doc_ansi_safe(spark):
    # Spark 4 runs ANSI mode by default: an empty doc (0 tokens) must
    # produce a zero-coverage row, not a DIVIDE_BY_ZERO abort
    from pyspark_recs.llmops.dedup import duplicate_text_spans

    docs = _docs(
        spark,
        [
            (1, "", "en", 0),
            (2, "a b c d e", "en", 9),
            (3, "a b c d e", "en", 9),
        ],
    )
    rows = {r.doc_id: r for r in duplicate_text_spans(docs).collect()}
    assert (rows[1].n_tokens, rows[1].dup_ppm) == (0, 0)
    assert rows[1].flag_trim is False
    assert rows[2].dup_ppm == 1_000_000  # the dup pair still detected


def test_duplicate_text_spans_randomized_differential(spark):
    """duplicate_text_spans vs an independent pure-Python reference
    (gram counting + interval-union coverage) on a seeded-random
    small-vocab corpus, where cross-doc 5-gram collisions are common."""
    import random

    from pyspark_recs.llmops.dedup import duplicate_text_spans

    rng = random.Random(20260817)
    vocab = ["w%d" % i for i in range(6)]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25)))
        for d in range(30)
    }
    docs = _docs(spark, [(d, t, "en", len(t)) for d, t in texts.items()])
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.covered_tokens,
                   r.max_span_tokens, r.dup_ppm)
        for r in duplicate_text_spans(docs).collect()
    }

    k = 5
    toks = {d: t.split() for d, t in texts.items()}
    gram_docs: dict[tuple, set] = {}
    for d, ws in toks.items():
        for i in range(len(ws) - k + 1):
            gram_docs.setdefault(tuple(ws[i : i + k]), set()).add(d)
    for d, ws in toks.items():
        starts = [
            i
            for i in range(len(ws) - k + 1)
            if len(gram_docs[tuple(ws[i : i + k])]) >= 2
        ]
        spans = []
        for s in starts:  # merge starts whose windows overlap or touch
            if spans and s - spans[-1][1] <= k:
                spans[-1][1] = s
            else:
                spans.append([s, s])
        covered = sum(e - b + k for b, e in spans)
        longest = max((e - b + k for b, e in spans), default=0)
        ppm = (covered * 1_000_000) // len(ws) if ws else 0
        assert got[d] == (len(ws), len(spans), covered, longest, ppm), d


def test_audio_autocorrelation_hand_computed(spark):
    from pyspark_recs.llmops.multimodal import audio_autocorrelation
    from pyspark_recs.llmops.wav import encode_wav

    # period-2 square wave +3/-3: energy = n*9, ac1 = -(n-1)*9,
    # ac2 = +(n-2)*9, ac4 = +(n-4)*9 — autocorrelation flags the
    # periodicity (positive at even lags, negative at odd).
    n = 16
    vals = [3 if i % 2 == 0 else -3 for i in range(n)]
    pcm = b"".join(v.to_bytes(2, "little", signed=True) for v in vals)
    good = encode_wav(8000, 1, pcm)
    payloads = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30]))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_autocorrelation(payloads).collect()}
    ok = rows[1]
    assert ok.status == "ok"
    assert ok.energy == n * 9
    assert ok.ac1 == -(n - 1) * 9
    assert ok.ac2 == (n - 2) * 9
    assert ok.ac4 == (n - 4) * 9
    err = rows[2]
    assert err.status == "decode_error"
    assert (err.energy, err.ac1, err.ac2, err.ac4) == (None,) * 4
