"""Unit tests for corpus scrubbing (PII redaction, decontamination)
and BM25 search — planted-case behavior beyond the oracle hash checks.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyspark_recs.llmops.scrub import (
    decontaminate,
    pii_redact,
    synthesize_pii,
)
from pyspark_recs.llmops.search import bm25_topk


def test_pii_redact_counts_and_digest(spark):
    text = (
        "reach me at jane.doe+x@mail.example.org or 415-555-0199; "
        "backup card 4242424242424242 and bob@corp.io"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pii_redact(df).first()
    assert (row.n_emails, row.n_phones, row.n_cards) == (2, 1, 1)
    expected = (
        "reach me at <EMAIL> or <PHONE>; "
        "backup card <CARD> and <EMAIL>"
    )
    assert row.redacted_len == len(expected)
    assert row.redacted_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_pii_redact_clean_text_untouched(spark):
    text = "no pii here, just words and numbers 123"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pii_redact(df).first()
    assert (row.n_emails, row.n_phones, row.n_cards) == (0, 0, 0)
    assert row.redacted_md5 == hashlib.md5(text.encode()).hexdigest()


def test_synthesize_pii_keys_on_doc_id(spark):
    df = spark.createDataFrame(
        [(7, "base"), (11, "base"), (13, "base"), (1, "base")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in synthesize_pii(df).collect()}
    assert out[7] == "base contact user7@example.com"
    assert out[11] == "base call 415-555-0011"
    assert out[13] == "base card 4242424242424242"
    assert out[1] == "base"


def test_decontaminate_flags_planted_overlap(spark):
    shared = "alpha beta gamma delta epsilon"
    train = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing text here"),
            (2, "totally different content with no overlap at all"),
            (3, "short"),  # < 5 words: definitionally clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"eval question mentions {shared} verbatim")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.contaminated for r in decontaminate(train, bench).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_bm25_prefers_rare_terms_and_tf(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common rare"),
            (3, "common common rare rare"),
            (4, "nothing matching here"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["rare"], k=3).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # Only docs containing the term score; higher tf ranks first.
    assert ranked == [3, 2]
    scores = {r.doc_id: r.score for r in out}
    assert scores[3] > scores[2] > 0


def test_boilerplate_grams_flags_shared_phrase(spark):
    from pyspark_recs.llmops.scrub import boilerplate_grams

    shared = "click here to subscribe"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma"),
            (2, f"{shared} delta epsilon zeta"),
            (3, f"{shared} eta theta iota"),
            (4, "completely unrelated words only once"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in boilerplate_grams(docs, min_df=3).collect()}
    # "click here to" / "here to subscribe" appear in 3 docs -> boilerplate
    for d in (1, 2, 3):
        assert out[d].n_boiler == 2
        assert 0 < out[d].boiler_frac < 1
    assert out[4].n_boiler == 0 and out[4].boiler_frac == 0.0


def test_novelty_gate_admits_fresh_rejects_seen(spark):
    from pyspark_recs.llmops.scrub import novelty_gate

    corpus_text = "the quick brown fox jumps over the lazy dog"
    corpus = spark.createDataFrame(
        [(100, corpus_text)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, corpus_text),                      # fully seen -> reject
            (2, "entirely novel sentence with unique words"),  # admit
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in novelty_gate(batch, corpus).collect()}
    assert got[1].n_novel == 0 and got[1].admit is False
    assert got[2].n_novel == got[2].n_grams and got[2].admit is True


def test_fuzzy_decontaminate_flags_neardup_only(spark):
    from pyspark_recs.llmops.scrub import fuzzy_decontaminate

    bench_text = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the tall green trees above the water"
    )
    # Near-dup: one word changed — most shingles (hence most minhash
    # permutations and at least one 2-row band) survive.
    neardup = bench_text.replace("lazy", "sleepy")
    unrelated = (
        "completely different subject matter about databases indexes "
        "query planners shuffle partitions and distributed aggregation"
    )
    train = spark.createDataFrame(
        [(1, neardup), (2, unrelated), (3, "too short")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.contaminated_fuzzy
        for r in fuzzy_decontaminate(train, bench).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_decontaminate_spans_excises_only_overlap(spark):
    from pyspark_recs.llmops.scrub import decontaminate_spans

    bench_text = "alpha beta gamma delta epsilon"  # one 5-gram
    # Train doc embeds the benchmark phrase mid-document: exactly the
    # window tokens [5..9] are excised, prefix and suffix survive.
    train_text = "one two three four five " + bench_text + " six seven"
    clean_doc = "totally unrelated words nothing shared here at all"
    train = spark.createDataFrame(
        [(1, train_text), (2, clean_doc)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    rows = {r.doc_id: r for r in decontaminate_spans(train, bench).collect()}
    assert rows[1].n_tokens == 12 and rows[1].n_removed == 5
    assert rows[2].n_removed == 0
    import hashlib

    survivors = "one two three four five six seven"
    assert rows[1].clean_md5 == hashlib.md5(survivors.encode()).hexdigest()
    assert rows[2].clean_md5 == hashlib.md5(clean_doc.encode()).hexdigest()
