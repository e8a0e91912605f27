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
