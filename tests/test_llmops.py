"""LLM-ops operator tests: sketch properties (MinHash estimates Jaccard,
SimHash preserves similarity), dedup behavior on planted near-dups, ANN
recall vs brute force, multimodal decode plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_recs.llmops import (
    cosine_topk_bruteforce,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from pyspark_recs.llmops.multimodal import decode_metadata, with_binary_payload
from pyspark_recs.llmops.similarity import (
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    # Unique tokens so the shingle sets are large, and the near-dup pair
    # differs in ONE word of 60 (Jaccard ~0.90) — high enough that the
    # minhash/LSH assertions hold for any correct hash family, not just
    # a lucky one (a repeated-phrase fixture dedups to ~15 shingles and
    # J~0.65, where 2-row LSH bands legitimately miss ~17% of pairs).
    base = " ".join(f"tok{i}" for i in range(60))
    variant = base.replace("tok30", "changed")  # near-dup of doc 1
    distinct = " ".join(f"other{i}" for i in range(40))
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),       # exact dup of 1
            (3, variant),    # near dup of 1
            (4, distinct),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_groups(spark, near_dup_docs):
    groups = exact_dedup_groups(near_dup_docs)
    by_canonical = {r.canonical_doc_id: r.n_docs for r in groups.collect()}
    assert by_canonical[1] == 2  # docs 1+2 collapse
    assert by_canonical[3] == 1 and by_canonical[4] == 1


def test_minhash_identical_docs_identical_sigs(spark, near_dup_docs):
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(near_dup_docs).collect()}
    assert sigs[1] == sigs[2]  # exact dups -> identical signatures
    # near-dup shares most minhashes; distinct doc shares almost none
    near_agree = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    far_agree = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert near_agree > far_agree
    assert near_agree >= 4  # high-Jaccard pair agrees on most permutations


def test_lsh_pairs_find_near_dups_not_distinct(spark, near_dup_docs):
    sigs = minhash_signatures(near_dup_docs)
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs  # exact dup always bucketed together
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_simhash_similar_docs_close_hamming(spark, near_dup_docs):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(near_dup_docs).collect()}
    assert fps[1] == fps[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(fps[1], fps[3]) <= hamming(fps[1], fps[4])


def test_ngram_jaccard_blocked_pairs(spark, near_dup_docs):
    docs = near_dup_docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    )
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, ["lang", "source"], shingle_n=3, threshold=0.0
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup
    assert pairs[(1, 3)] > 0.5  # near dup
    assert pairs[(1, 4)] == 0.0  # disjoint vocab


def test_cosine_topk_exact_neighbors(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk_bruteforce(
        vecs, vecs.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2]  # closest first; self excluded
    assert all(r.query_id == 0 for r in out)


def test_lsh_ann_recall_vs_bruteforce(spark):
    import random

    random.seed(13)
    data = [
        (i, [random.gauss(0, 1) for _ in range(16)]) for i in range(200)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(vecs, queries, k=5).collect()
    }
    # lsh_topk ranks by euclidean distance; on unnormalized gaussians the
    # top sets still overlap heavily with cosine on these small dims.
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(vecs, queries, k=5, num_hash_tables=6).collect()
    }
    assert len(approx) == 25
    # sanity: every query answered
    assert {q for q, _ in approx} == {0, 1, 2, 3, 4}


def test_embedding_neardup_finds_planted_pair(spark):
    base = [1.0, 2.0, -1.0, 0.5, 3.0, -0.2, 0.8, 1.1]
    neardup = [x + 0.01 for x in base]       # cosine ≈ 1 with base
    opposite = [-x for x in base]            # cosine = -1, different bucket
    orthogonalish = [2.0, -1.0, 1.0, 3.0, -0.5, 0.7, -2.0, 0.1]
    vecs = spark.createDataFrame(
        [(0, base), (1, neardup), (2, opposite), (3, orthogonalish)],
        "vec_id long, embedding array<float>",
    )
    pairs = embedding_neardup_pairs(vecs, threshold=0.95, sign_bits=8).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].cos_sim > 0.99


def test_ivf_recall_vs_bruteforce(spark):
    import random

    # Clustered data so IVF cells align with true neighborhoods.
    random.seed(7)
    centers = [[random.gauss(0, 5) for _ in range(16)] for _ in range(4)]
    data = [
        (i, [c + random.gauss(0, 0.5) for c in centers[i % 4]])
        for i in range(120)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(vecs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(vecs, queries, k=5, n_cells=8, nprobe=4).collect()
    }
    assert len(approx) == 25
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9  # nprobe=4 of 8 cells on well-separated clusters


def test_multimodal_resize_and_frame_sample(spark, near_dup_docs):
    from pyspark_recs.llmops.multimodal import (
        frame_sample,
        resize_payload,
        with_binary_payload,
    )

    payloads = with_binary_payload(near_dup_docs)
    resized = resize_payload(payloads, out_bytes=16).collect()
    assert len(resized) == 4  # all docs >= 16 bytes
    assert all(len(r.resized) == 16 and r.n_bytes == 16 for r in resized)
    # identical payloads -> identical thumbnails (docs 1 and 2 are dups)
    by_id = {r.doc_id: bytes(r.resized) for r in resized}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]

    frames = frame_sample(payloads, frame_size=32, hop=32)
    got = frames.filter(F.col("doc_id") == 1).orderBy("frame_idx").collect()
    text_len = len(near_dup_docs.filter(F.col("doc_id") == 1).first().text)
    assert len(got) == (text_len - 32) // 32 + 1
    assert [r.frame_idx for r in got] == list(range(len(got)))
    assert all(r.frame_bytes == 32 for r in got)


def test_multimodal_extract_features(spark, near_dup_docs):
    from pyspark_recs.llmops.multimodal import extract_features

    out = {r.doc_id: r.features for r in extract_features(
        with_binary_payload(near_dup_docs), dim=8
    ).collect()}
    src = {r.doc_id: r.text.encode() for r in near_dup_docs.collect()}
    for doc_id, payload in src.items():
        stride = len(payload) // 8
        expect = [payload[j * stride] / 255.0 for j in range(8)]
        assert out[doc_id] == expect
    # short payloads are dropped, not errored
    tiny = spark.createDataFrame([(9, "ab")], "doc_id long, text string")
    assert extract_features(with_binary_payload(tiny), dim=8).count() == 0


def test_approx_distinct_error_bound(spark):
    from pyspark_recs.workloads.relational import (
        r25_count_distinct,
        r27_approx_distinct,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.o_orderpriority: r.n_customers for r in r25_count_distinct(spark, sf).collect()}
    rows = {r.o_orderpriority: r for r in r27_approx_distinct(spark, sf).collect()}
    for k, v in exact.items():
        # r27 emits (exact_customers, within_bound): exact must reproduce
        # r25, and the HLL sketch must land within its 4·rsd bound.
        assert rows[k].exact_customers == v
        assert rows[k].within_bound is True


def test_multimodal_decode_metadata(spark, near_dup_docs):
    import hashlib

    decoded = {r.doc_id: r for r in decode_metadata(with_binary_payload(near_dup_docs)).collect()}
    src = {r.doc_id: r.text for r in near_dup_docs.collect()}
    for doc_id, text in src.items():
        r = decoded[doc_id]
        assert r.n_bytes == len(text.encode())
        assert r.first_byte == text.encode()[0]
        assert r.payload_hash == hashlib.md5(text.encode()).hexdigest()


def test_tfidf_top_terms_hand_computed(spark):
    from pyspark_recs.llmops.textstats import tf_idf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry durian"),
        ],
        "doc_id long, text string",
    )
    top1 = {
        r.doc_id: r.token
        for r in tf_idf_top_terms(docs, k=1).collect()
    }
    # idf: apple/durian ln(4/2)+1, banana/cherry ln(4/3)+1
    # doc1: apple 2*1.6931 beats banana; doc3: durian beats cherry
    # doc2: banana == cherry (exact tie) -> token ascending
    assert top1 == {1: "apple", 2: "banana", 3: "durian"}


def test_pack_sequences_bins_hand_computed(spark):
    from pyspark_recs.llmops.textstats import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "s", "a " * 300),   # 300 tokens -> starts at 0, bin 0
            (2, "s", "b " * 300),   # starts at 300, bin 0 (crosses into 1)
            (3, "s", "c " * 300),   # starts at 600, bin 1
            (4, "t", "d " * 100),   # other group restarts at 0
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.bin_idx)
        for r in pack_sequences(docs, capacity=512, group_col="source").collect()
    }
    assert out == {1: (300, 0), 2: (300, 0), 3: (300, 1), 4: (100, 0)}


def test_ivf_with_kmeans_centroids(spark):
    import random

    from pyspark_recs.llmops.similarity import kmeans_centroids

    random.seed(11)
    centers = [[random.gauss(0, 5) for _ in range(8)] for _ in range(3)]
    data = [
        (i, [c + random.gauss(0, 0.3) for c in centers[i % 3]])
        for i in range(90)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 4)
    cents = kmeans_centroids(vecs, n_cells=3)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(vecs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            vecs, queries, k=5, nprobe=1, centroids=cents
        ).collect()
    }
    # fitted cells align with the true clusters: nprobe=1 suffices
    assert len(approx) == 20
    assert len(exact & approx) / len(exact) >= 0.9


def test_dedup_components_planted_clusters(spark, near_dup_docs):
    from pyspark_recs.llmops.dedup import (
        connected_components,
        verified_neardup_edges,
    )

    edges = verified_neardup_edges(near_dup_docs, threshold=0.5)
    labels = connected_components(edges, near_dup_docs.select("doc_id"))
    got = {r.node: r.label for r in labels.collect()}
    # docs 1,2 (exact dups) and 3 (near dup) form one cluster -> min id 1
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4  # distinct doc is its own canonical


def test_bigram_repetition_hand_computed(spark):
    from pyspark_recs.llmops.textstats import bigram_repetition

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: ab ba ab ba -> top 2/4
            (2, "x y z w"),     # bigrams: xy yz zw    -> all distinct
            (3, "solo"),        # no bigrams -> excluded
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_repetition(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 4
    assert got[1].n_distinct_bigrams == 2
    assert got[1].top_bigram_count == 2
    assert got[1].top_bigram_frac == 0.5
    assert got[2].top_bigram_frac == pytest.approx(1 / 3)
    assert got[2].distinct_bigram_frac == 1.0


def test_gopher_rules_each_flag(spark):
    from pyspark_recs.llmops.textstats import gopher_rules

    passing = "the quick brown fox is happy to see a dog in the park " * 3
    docs = spark.createDataFrame(
        [
            (1, passing.strip()),                  # all rules pass
            (2, "too short to pass"),              # tokens_ok fails
            (3, ("antidisestablishmentarianism " * 40).strip()),  # mean len
            (4, ("fox dog cat bat rat hen cow pig owl elk " * 4).strip()),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].passes
    assert not got[2].tokens_ok and not got[2].passes
    assert not got[3].mean_len_ok and not got[3].passes
    assert not got[4].stop_ok and not got[4].passes  # no stopwords at all


def test_scalar_quantize_roundtrip_error_bound(spark):
    from pyspark_recs.llmops.similarity import scalar_quantize

    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.5, 1.0, -1.0]),
            (2, [3.25, 3.25, 3.25]),        # constant vector: scale = 0
            (3, [1e-3, 2e-3, -5e-4]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in scalar_quantize(vecs).collect()}
    for vid, emb in [(1, [0.0, 0.5, 1.0, -1.0]), (3, [1e-3, 2e-3, -5e-4])]:
        r = rows[vid]
        scale = (r.vmax - r.vmin) / 255
        assert all(0 <= c <= 255 for c in r.codes)
        for x, c in zip(emb, r.codes):
            assert abs((r.vmin + c * scale) - x) <= scale / 2 + 1e-9
    # constant vector: all codes 0, dequantizes exactly to vmin
    assert rows[2].codes == [0, 0, 0]
    assert rows[2].vmin == rows[2].vmax


def test_quantized_vectors_preserve_neighbors(spark):
    """Dequantized int8 vectors recover the exact top-k of the originals
    on separated clusters — the quantize->search integration check."""
    from pyspark_recs.llmops.similarity import scalar_quantize

    data = [
        (i, [float(i % 4 == 0), float(i % 4 == 1),
             float(i % 4 == 2), float(i % 4 == 3),
             0.1 * (i % 7), 0.05 * (i % 5)])
        for i in range(24)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    deq = scalar_quantize(vecs).select(
        "vec_id",
        F.transform(
            "codes",
            lambda c: F.col("vmin")
            + c.cast("double") * (F.col("vmax") - F.col("vmin")) / F.lit(255.0),
        ).alias("embedding"),
    )
    queries = vecs.filter(F.col("vec_id") < 4)
    deq_queries = deq.filter(F.col("vec_id") < 4)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(vecs, queries, k=3).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(deq, deq_queries, k=3).collect()
    }
    assert len(exact & quant) / len(exact) >= 0.9


def test_source_mixture_weights_sum_to_one(spark):
    from pyspark_recs.workloads.llmops import l26_source_mixture

    got = l26_source_mixture(spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r.weight for r in got) - 1.0) < 1e-9
    # equal-count strata -> equal weights
    if len({r.n_docs for r in got}) == 1:
        assert len({round(r.weight, 12) for r in got}) == 1


def test_chunk_documents_hand_computed(spark):
    from pyspark_recs.llmops.textstats import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    got = sorted(
        chunk_documents(docs, chunk=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,3,6,9 -> windows of 4 tokens, last is partial
    assert [r.chunk_text for r in by_doc[1]] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
    ]
    assert [r.chunk_tokens for r in by_doc[1]] == [4, 4, 4, 1]
    assert [r.chunk_idx for r in by_doc[1]] == [0, 1, 2, 3]
    # doc 2 fits one chunk; empty doc 3 yields nothing
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc


def test_chunk_udtf_parity_with_relational(spark):
    """The Python-UDTF chunker and the relational chunker agree row
    for row (the §2.8 extension surface keeps the engine contract)."""
    from pyspark_recs.llmops.textstats import (
        chunk_documents,
        chunk_documents_udtf,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rel = chunk_documents(docs, chunk=4, stride=3)
    ext = chunk_documents_udtf(docs, chunk=4, stride=3)
    assert rel.exceptAll(ext).count() == 0
    assert ext.exceptAll(rel).count() == 0


def test_prepare_corpus_end_to_end(spark):
    """The corpus-prep flow: junk filtered by rules, near-dups
    collapsed to one representative, survivors chunked and packed."""
    from pyspark_recs.llmops.pipeline import prepare_corpus

    good = "the quick brown fox is happy to see a dog in the park " * 3
    near = good.replace("happy", "glad")
    docs = spark.createDataFrame(
        [
            (1, good.strip(), "s1"),
            (2, good.strip(), "s1"),   # exact dup -> collapses into 1
            (3, near.strip(), "s2"),   # near dup  -> collapses into 1
            (4, "too short", "s2"),    # fails the quality rules
            (5, ("the fox and the dog and the owl and the elk are here "
                 * 3).strip(), "s2"),  # distinct survivor
        ],
        "doc_id long, text string, source string",
    )
    res = prepare_corpus(docs, neardup_threshold=0.5)
    assert {r.doc_id for r in res.kept.select("doc_id").collect()} == {1, 2, 3, 5}
    assert {r.doc_id for r in res.canonical.select("doc_id").collect()} == {1, 5}
    funnel = {r.stage: r.n_docs for r in res.funnel.collect()}
    assert funnel["input"] == 5
    assert funnel["quality_kept"] == 4
    assert funnel["canonical"] == 2
    assert funnel["chunks"] >= 2
    # packing covers every canonical doc exactly once
    assert res.packed.count() == 2
    assert res.chunks.filter(F.col("doc_id") == 4).count() == 0


def test_prepare_corpus_url_stage_and_injected_ids(spark):
    """The r11 extensions: url_col runs a keep-first pass BEFORE the
    quality rules (min doc_id per canonical url), and canonical_ids
    skips the CC fit and trusts the injected representatives."""
    from pyspark_recs.llmops.pipeline import prepare_corpus

    good = "the quick brown fox is happy to see a dog in the park " * 3
    other = "the fox and the dog and the owl and the elk are here " * 3
    docs = spark.createDataFrame(
        [
            (1, good.strip(), "s1", "https://a.com/x"),
            (2, other.strip(), "s1", "https://a.com/x"),  # same url as 1
            (3, other.strip(), "s2", "https://a.com/y"),
            (4, "too short", "s2", "https://a.com/z"),
        ],
        "doc_id long, text string, source string, canonical_url string",
    )
    res = prepare_corpus(docs, url_col="canonical_url")
    # doc 2 dies at the URL stage (doc 1 is first), even though its
    # TEXT is distinct — url dedup precedes content dedup
    assert {r.doc_id for r in res.url_kept.select("doc_id").collect()} == {
        1, 3, 4,
    }
    funnel = {r.stage: r.n_docs for r in res.funnel.collect()}
    assert funnel["input"] == 4
    assert funnel["url_kept"] == 3
    assert funnel["quality_kept"] == 2  # doc 4 fails the rules
    assert funnel["canonical"] == 2     # 1 and 3 are not near-dups

    # injected canonical ids are trusted verbatim (serve path):
    # restrict to {3} and the packed table follows
    ids = spark.createDataFrame([(3,)], "doc_id long")
    served = prepare_corpus(
        docs, url_col="canonical_url", canonical_ids=ids
    )
    assert [r.doc_id for r in served.packed.collect()] == [3]
    assert {r.stage: r.n_docs for r in served.funnel.collect()}[
        "canonical"
    ] == 1


def test_corpus_to_tokenizer_trains_on_canonical_only(spark):
    """l101's contract: the BPE trainer consumes the funnel's OUTPUT —
    merges learned from prepare_corpus(...).canonical equal merges
    learned from the hand-known survivor set, and differ from raw-doc
    training when a dominant pair lives only in collapsed near-dups
    (so any funnel bug that changes the survivors changes the merge
    table, which is what lets l101's hash pin the whole chain)."""
    from pyspark_recs.llmops.pipeline import prepare_corpus
    from pyspark_recs.llmops.textstats import bpe_train_merges

    good = "the quick brown fox is happy to see a dog in the park " * 3
    near = good.replace("happy", "glad")
    docs = spark.createDataFrame(
        [
            (1, good.strip(), "s1"),
            (2, good.strip(), "s1"),   # exact dup of 1
            (3, near.strip(), "s2"),   # near dup of 1
            (5, ("the fox and the dog and the owl and the elk are here "
                 * 3).strip(), "s2"),
        ],
        "doc_id long, text string, source string",
    )
    res = prepare_corpus(docs, neardup_threshold=0.5)
    chained = bpe_train_merges(res.canonical, n_merges=2).collect()
    survivors = docs.filter(F.col("doc_id").isin(1, 5))
    expected = bpe_train_merges(survivors, n_merges=2).collect()
    assert [tuple(r) for r in chained] == [tuple(r) for r in expected]
    raw = bpe_train_merges(docs, n_merges=2).collect()
    # the duplicated docs triple 'th'-dominance weights: pair COUNTS
    # must differ even where the winning pair coincides
    assert [tuple(r) for r in raw] != [tuple(r) for r in chained]


def test_synthetic_url_blocked_merges_within_block(spark):
    """Block members share host+article, so the canonicalizer merges
    them into exactly 2 canonical urls per 4-block ({0,1} plain,
    {2,3} ?page=2) — the linear-scaling property l98 relies on."""
    from pyspark_recs.llmops.urls import (
        canonicalize_url,
        synthetic_url_blocked,
    )

    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        canonicalize_url(
            synthetic_url_blocked(F.col("id"))
        ).alias("canon"),
    )
    rows = {r.doc_id: r.canon for r in df.collect()}
    # block 0 (ids 0-3): ids 0,1 merge; ids 2,3 merge; plain != page2
    assert rows[0] == rows[1] == "https://site0.example.com/articles/0"
    assert rows[2] == rows[3] == "https://site0.example.com/articles/0?page=2"
    # 40 ids -> 10 blocks -> exactly 20 canonical urls
    assert df.select("canon").distinct().count() == 20
    # host cycles with the block, article is the block index
    assert rows[37] == "https://site9.example.com/articles/9"
    assert rows[38] == "https://site9.example.com/articles/9?page=2"


def test_policy_gate_planted_cases(spark):
    """Hand-planted messy heads: attribute order, quote style, case,
    http-vs-https, extra whitespace, missing tags — the extractor must
    handle all of them and the gate must fail closed on license /
    open on robots."""
    from pyspark_recs.llmops.policy import policy_gate

    cases = [
        # (id, head, want_noindex, want_license, want_allowed)
        (1, '<head><META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">'
            '<link rel="license" '
            'href="https://creativecommons.org/licenses/by/4.0/"></head>',
         True, "licenses/by/4.0", False),
        (2, "<head><meta content='index, follow' name='robots'>"
            "<link href='http://creativecommons.org/publicdomain/zero/1.0'"
            " rel='license'></head>",
         False, "publicdomain/zero/1.0", True),
        (3, "<head><title>bare page</title></head>",
         False, None, False),
        (4, '<head><meta  name = "robots"  content = "noindex"></head>',
         True, None, False),
        (5, '<head><link rel="license" '
            'href="https://creativecommons.org/licenses/by-nc/4.0"></head>',
         False, "licenses/by-nc/4.0", False),
        (6, '<head><LINK HREF="https://creativecommons.org/licenses/'
            'by-sa/4.0/" REL="LICENSE"></head>',
         False, "licenses/by-sa/4.0", True),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, *_ in cases], "doc_id long, head string"
    )
    got = {r.doc_id: r for r in policy_gate(df, "head").collect()}
    for i, _, want_noindex, want_license, want_allowed in cases:
        r = got[i]
        assert r.noindex is want_noindex, f"noindex wrong for case {i}"
        assert r.license == want_license, f"license wrong for case {i}"
        assert r.allowed is want_allowed, f"allowed wrong for case {i}"


def test_robots_parser_and_longest_match_planted(spark):
    """Hand-planted robots.txt: group attribution must skip the wrong
    agent's group, empty Disallow must match nothing, comments/blank
    lines are ignored, directives are case-insensitive, the LONGEST
    matching prefix wins, and Allow beats Disallow on equal length."""
    from pyspark_recs.llmops.policy import (
        parse_robots_rules,
        robots_decisions,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "# banner comment\n"
                "User-agent: googlebot\n"
                "Disallow: /\n"
                "\n"
                "USER-AGENT: *\n"
                "DISALLOW: /docs/\n"
                "allow: /docs/pub\n"
                "Disallow:\n",  # empty: matches nothing
            ),
            (
                "b.com",
                "User-agent: *\n"
                "Disallow: /x\n"
                "Allow: /x\n",  # tie on length: Allow wins
            ),
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots)
    got_rules = {
        (r.host, r.rule_type, r.prefix) for r in rules.collect()
    }
    # googlebot's "Disallow: /" must NOT be attributed to *
    assert ("a.com", "disallow", "/") not in got_rules
    assert ("a.com", "disallow", "/docs/") in got_rules
    assert ("a.com", "allow", "/docs/pub") in got_rules

    urls = spark.createDataFrame(
        [
            (1, "a.com", "/docs/private"),   # disallow /docs/
            (2, "a.com", "/docs/public"),    # allow /docs/pub (longer)
            (3, "a.com", "/other"),          # no rule -> allowed
            (4, "b.com", "/x/y"),            # tie -> allow wins
            (5, "c.com", "/anything"),       # host with no robots
        ],
        "doc_id long, host string, path string",
    )
    got = {r.doc_id: r for r in robots_decisions(urls, rules).collect()}
    assert got[1].crawl_allowed is False
    assert got[1].matched_rule == "/docs/"
    assert got[2].crawl_allowed is True
    assert got[2].matched_rule == "/docs/pub"
    assert got[3].crawl_allowed is True and got[3].matched_rule is None
    assert got[4].crawl_allowed is True and got[4].rule_type == "allow"
    assert got[5].crawl_allowed is True


def test_fetch_payloads_retry_and_dead_letter(spark):
    from pyspark_recs.llmops.multimodal import (
        fetch_payloads,
        synthesize_image_urls,
    )

    docs = spark.createDataFrame(
        [(7,), (11,), (13,), (143,)], "doc_id bigint"
    )
    rows = {
        r.doc_id: r
        for r in fetch_payloads(synthesize_image_urls(docs)).collect()
    }
    assert rows[7].status == "ok" and rows[7].n_attempts == 1
    # transient failure: succeeds on the second attempt
    assert rows[11].status == "ok" and rows[11].n_attempts == 2
    # permanent failure: exhausts retries, dead-lettered, payload NULL
    assert rows[13].status == "dead_letter" and rows[13].n_attempts == 3
    assert rows[13].payload is None
    assert rows[143].status == "dead_letter"  # 143 = 11*13 -> permanent
    assert bytes(rows[7].payload) == b"https://img.example.com/7.jpg"


def test_fetch_payloads_pluggable_fetcher(spark):
    """The fetcher contract is pluggable: a custom (url, attempt) ->
    bytes callable replaces the fake — the seam where a real HTTP GET
    (urllib/requests) plugs in."""
    from pyspark_recs.llmops.multimodal import fetch_payloads

    df = spark.createDataFrame(
        [(1, "u://a"), (2, "u://b")], "doc_id bigint, url string"
    )

    def fetcher(url, attempt):
        return url[-1].encode() * 3

    rows = {r.doc_id: bytes(r.payload) for r in fetch_payloads(df, fetcher).collect()}
    assert rows == {1: b"aaa", 2: b"bbb"}


def test_encode_payloads_unit_norm_and_pluggable(spark):
    import math

    from pyspark_recs.llmops.multimodal import (
        ENCODER_DIM,
        encode_payloads,
        tiny_image_encoder,
    )

    df = spark.createDataFrame(
        [(1, b"the quick brown fox jumps"), (2, b"short")],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r.embedding for r in encode_payloads(df).collect()}
    # too-short payload dropped; embedding is unit-norm, ENCODER_DIM wide
    assert set(rows) == {1}
    assert len(rows[1]) == ENCODER_DIM
    assert abs(math.sqrt(sum(x * x for x in rows[1])) - 1.0) < 1e-9
    # spark result == driving the batched encoder contract directly
    assert rows[1] == tiny_image_encoder([b"the quick brown fox jumps"])[0]

    # pluggable: swap the model for a constant-vector "encoder"
    def const_encoder(payloads):
        return [[1.0, 0.0] for _ in payloads]

    got = encode_payloads(df, encoder=const_encoder).collect()
    assert all(r.embedding == [1.0, 0.0] for r in got)


def test_text_image_search_ranks_self_prompt_first(spark):
    """Planted structure: an image whose payload IS the prompt's bytes
    must rank first for that prompt (identical vectors, cosine 1)."""
    from pyspark_recs.llmops.multimodal import encode_payloads
    from pyspark_recs.llmops.similarity import crossmodal_topk

    prompts = ["red summer dress", "leather ankle boots"]
    images = spark.createDataFrame(
        [(100, prompts[0].encode()), (200, prompts[1].encode())]
        + [(300 + i, f"unrelated payload number {i}".encode()) for i in range(5)],
        "doc_id bigint, payload binary",
    )
    qdf = spark.createDataFrame(
        [(i, p.encode()) for i, p in enumerate(prompts)],
        "doc_id bigint, payload binary",
    )
    ivecs = encode_payloads(images)
    qvecs = encode_payloads(qdf).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = {
        r.query_id: r.doc_id
        for r in crossmodal_topk(ivecs, qvecs, k=1).collect()
    }
    assert top == {0: 100, 1: 200}


def test_lsh_topk_bounded_candidates(spark):
    # Pathological bucket: 100 identical vectors all collide in every
    # hash table. The candidate cap must bound rescoring work while
    # still answering every query with k rows.
    vec = [1.0, 0.0, 2.0, -1.0]
    vecs = spark.createDataFrame(
        [(i, vec) for i in range(100)], "vec_id long, embedding array<float>"
    )
    queries = vecs.filter(F.col("vec_id") < 2)
    rows = lsh_topk(
        vecs, queries, k=5, num_hash_tables=3, max_candidates_per_query=10
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(by_q) == {0, 1}
    for q, neighbors in by_q.items():
        assert len(neighbors) == 5
        # The cap keeps the 10 lowest neighbor_ids (excluding self); with
        # all distances tied, the final top-5 is the 5 lowest of those —
        # observable proof the cap was applied before rescoring.
        expected_pool = [i for i in range(100) if i != q][:10]
        assert neighbors == set(expected_pool[:5])


def test_semantic_dedup_drops_planted_duplicate_keeps_first(spark):
    from pyspark_recs.llmops.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),   # same direction as 1 => cos = 1
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal survivor
        (4, [-1.0, -0.1, 0.0, 0.0]),  # far from everything
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.status
        for r in semantic_dedup(vecs, threshold=0.95, n_cells=2).collect()
    }
    # 1 and 2 collide (cos=1, same cell by construction): lowest id kept.
    assert got[1] == "keep" and got[2] == "drop"
    assert got[3] == "keep" and got[4] == "keep"


def test_embedding_covariance_and_pca_top_direction(spark):
    import math

    from pyspark_recs.llmops.similarity import (
        embedding_covariance,
        pca_projection,
    )

    # Variance concentrated on dim 1 (values ±10), noise on dim 2 (±1),
    # dim 3 constant: PCA's top direction must align with e1.
    rows = [
        (1, [10.0, 1.0, 5.0]),
        (2, [-10.0, -1.0, 5.0]),
        (3, [10.0, -1.0, 5.0]),
        (4, [-10.0, 1.0, 5.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cov = embedding_covariance(vecs)
    got = {(r.i, r.j): r.cov for r in cov.collect()}
    assert got[(1, 1)] == 100.0 and got[(2, 2)] == 1.0
    assert got[(3, 3)] == 0.0 and got[(1, 2)] == 0.0
    top = pca_projection(cov, top_k=1)[0]
    assert abs(abs(top[0]) - 1.0) < 1e-9
    assert math.hypot(top[1], top[2]) < 1e-9


def test_hamming_neardup_pigeonhole_finds_all_close_pairs(spark):
    from pyspark_recs.llmops.dedup import hamming_neardup_pairs

    fps = spark.createDataFrame(
        [
            (1, 0b1010101010101010),
            (2, 0b1010101010101011),  # distance 1 from doc 1
            (3, 0b1010101010100101),  # distance 3 from doc 1 (> radius)
            (4, 0b0101010101010101),  # distance 16 from doc 1
        ],
        "doc_id long, simhash long",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(fps, radius=2).collect()
    }
    assert got == {(1, 2): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hamming_neardup_pairs(fps, radius=4, n_blocks=4)


def test_jl_projection_preserves_basis_norms_exactly(spark):
    """Rademacher rows have |s|=1, so a basis vector's projected norm is
    exactly 1 (Σ_k s²/k) — a sharp correctness check on the sign
    matrix, the fixed-point fold, and the √k normalizer at once."""
    from pyspark_recs.llmops.similarity import jl_project

    d = 16
    rows = [(i, [1.0 if j == i else 0.0 for j in range(d)]) for j_ in [0] for i in range(4)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = jl_project(vecs, out_dim=4, in_dim=d).collect()
    for r in out:
        norm2 = sum(r[f"y_{k}"] ** 2 for k in range(4))
        assert abs(norm2 - 1.0) < 1e-9


def test_segment_dedup_keeps_first_and_drops_copies(spark):
    from pyspark_recs.llmops.dedup import segment_dedup

    seg = "a b c d e f g h"          # exactly one 8-token segment
    uniq = "p q r s t u v w"
    docs = spark.createDataFrame(
        [
            (1, seg + " " + uniq),    # first occurrence of both segments
            (2, seg),                 # exact copy of doc 1's first segment
            (3, "x y z"),             # short doc, 3-token segment
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in segment_dedup(docs).collect()}
    assert out[1].n_dup_segments == 0 and out[1].retained_ratio == 1.0
    assert out[2].n_dup_segments == 1 and out[2].retained_tokens == 0
    assert out[3].n_segments == 1 and out[3].n_tokens == 3
    assert out[2].retained_ratio == 0.0


def test_pq_encode_codebook_vectors_have_zero_error(spark):
    # The 16 lowest-id vectors ARE the codebook, so each must encode to
    # itself (sq_error == 0) and codes must be a valid [0, 16) index.
    from pyspark_recs.io import load_table
    from pyspark_recs.llmops.similarity import pq_encode

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = pq_encode(emb).collect()
    ids16 = sorted(r.vec_id for r in out)[:16]
    for r in out:
        for m in range(4):
            assert 0 <= r[f"code_{m}"] < 16
        if r.vec_id in ids16:
            assert r.sq_error == 0.0, r


def test_weighted_sample_covers_heavy_docs_and_hits_target(spark):
    from pyspark_recs.workloads.llmops import l52_weighted_sample

    out = l52_weighted_sample(spark, "/root/testdata/sf0.001").collect()
    # systematic sampling takes ~target rows (one per step of mass);
    # a row can carry several ticks, so <= target + slack, >= target/2
    assert 50 <= len(out) <= 110
    # determinism: same sample on a differently-partitioned rerun
    again = {
        r.doc_id
        for r in l52_weighted_sample(spark, "/root/testdata/sf0.001")
        .repartition(7)
        .collect()
    }
    assert {r.doc_id for r in out} == again


def test_containment_catches_subsumed_doc_jaccard_misses(spark):
    # A 5-word doc fully inside a 50-word doc: containment of the short
    # side is 100%, while Jaccard is ~0.1 — the planted case for the
    # subsumption criterion.
    from pyspark_recs.llmops.dedup import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long_doc = short + " " + " ".join(f"w{i}" for i in range(45))
    df = spark.createDataFrame(
        [(1, short, "en", "s"), (2, long_doc, "en", "s"),
         (3, "totally different words here", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    pairs = containment_pairs(
        df, group_cols=["lang", "source"], shingle_n=1, threshold_ppm=900_000
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}
    row = pairs[0]
    assert row.contain_a_ppm == 1_000_000  # short fully inside long
    assert row.contain_b_ppm == 1_000_000 * 5 // 50
    jac = ngram_jaccard_pairs(
        df, group_cols=["lang", "source"], shingle_n=1, threshold=0.5
    ).collect()
    assert jac == []  # symmetric Jaccard misses the subsumption


def test_weighted_reservoir_prefers_heavy_docs(spark):
    # Efraimidis-Spirakis: expected inclusion is weight-proportional.
    # With one doc carrying half the total mass, it must appear in a
    # top-10 sample; a uniform sampler would include it w.p. ~10/1000.
    import pyspark.sql.functions as F
    from pyspark_recs.llmops.hashing import md5_long

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, 1_000_000).otherwise(1).alias("n_chars"),
    )
    u = (
        (md5_long(F.concat(F.lit("l53:"), F.col("doc_id"))) + 1).cast("double")
        / F.lit(float(2**60 + 1))
    )
    keyed = df.withColumn("es_key", F.log(u) / F.col("n_chars").cast("double"))
    top = keyed.orderBy(F.desc("es_key"), F.asc("doc_id")).limit(10).collect()
    assert 0 in {r.doc_id for r in top}


def test_countmin_estimate_dominates_exact_count(spark):
    # CMS never under-counts; with 4 rows x 256 buckets over a small
    # vocabulary most top tokens should be estimated exactly.
    from pyspark_recs.workloads.llmops import l54_countmin_sketch

    out = l54_countmin_sketch(spark, "/root/testdata/sf0.001").collect()
    assert out
    assert all(r.cms_est >= r.exact_cnt for r in out)


def test_binary_file_source_feeds_decode_pipeline(spark, tmp_path):
    # A directory of real files enters through binaryFile and flows
    # through the same Arrow decode as the synthetic payload column.
    from pyspark_recs.llmops.multimodal import decode_metadata, read_binary_dir

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x89PNG-ish payload")
    (d / "b.bin").write_bytes(b"RIFF-ish payload!")
    (d / "skip.txt").write_bytes(b"not media")

    df = read_binary_dir(spark, str(d), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 2  # pathGlobFilter pruned at listing time
    assert len({r.doc_id for r in rows}) == 2
    meta = decode_metadata(df.select("doc_id", "payload")).collect()
    by_bytes = {r.n_bytes for r in meta}
    assert by_bytes == {16, 17}


def test_ivfpq_recall_vs_bruteforce(spark):
    import random

    from pyspark_recs.llmops.similarity import ivfpq_topk

    # Clustered data (16-dim = 4 subspaces x 4) so coarse cells align
    # with true neighborhoods and PQ codes separate clusters.
    random.seed(11)
    centers = [[random.gauss(0, 5) for _ in range(16)] for _ in range(4)]
    data = [
        (i, [c + random.gauss(0, 0.3) for c in centers[i % 4]])
        for i in range(120)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 5)
    rows = ivfpq_topk(
        vecs, queries, k=5, n_cells=8, nprobe=4, n_subspaces=4, n_codes=16
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(approx) == 25
    assert {q for q, _ in approx} == {0, 1, 2, 3, 4}
    # Within a tight cluster, 2-byte codes can't rank individual
    # members (quantization error ~ the intra-cluster noise — intrinsic
    # to PQ, which is why FAISS re-ranks survivors with exact floats).
    # What IVF-PQ MUST get right is the cluster: every returned
    # neighbor comes from its query's own cluster (i % 4).
    for q, n in approx:
        assert n % 4 == q % 4, (q, n)
    # distances are exact fixed-point sums: non-negative and
    # deterministic across re-runs (bit-identical re-execution).
    rows2 = ivfpq_topk(
        vecs, queries, k=5, n_cells=8, nprobe=4, n_subspaces=4, n_codes=16
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    for r in rows:
        assert r.adc_dist >= 0.0


def test_group_aware_split_is_resumable_under_corpus_growth(spark):
    """l67's docstring claims RESUMABILITY: when the corpus grows by
    new near-dups of existing clusters (append-only doc ids), every
    previously-assigned document keeps its split, and each new near-dup
    inherits its cluster's split. Pin it: assignment depends only on
    the canonical (min) doc id, which append-only growth cannot
    change unless clusters merge."""
    from pyspark_recs.llmops.dedup import (
        connected_components,
        verified_neardup_edges,
    )
    from pyspark_recs.workloads.llmops import split_from_labels

    def assign(docs):
        edges = verified_neardup_edges(docs, threshold=0.5)
        labels = connected_components(edges, docs.select("doc_id")).select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("canonical_doc_id"),
        )
        return {
            r.doc_id: (r.canonical_doc_id, r.split)
            for r in split_from_labels(labels).collect()
        }

    base_texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "spark shuffles partition data across executors during joins"),
        (4, "completely unrelated text about parquet footers and row groups"),
        (5, "duckdb runs the oracle side of every registry query here"),
    ]
    schema = "doc_id long, text string"
    v1 = assign(spark.createDataFrame(base_texts, schema))
    # grow the corpus: 6 is a near-copy of 3, 7 of 4, 8 is novel —
    # all with HIGHER ids than their cluster's members
    grown = base_texts + [
        (6, "spark shuffles partition data across executors during joins!"),
        (7, "completely unrelated text about parquet footers and row group"),
        (8, "yet another brand new document with its very own words"),
    ]
    v2 = assign(spark.createDataFrame(grown, schema))
    # every previously-assigned doc keeps BOTH canonical id and split
    for doc_id, before in v1.items():
        assert v2[doc_id] == before, (doc_id, before, v2[doc_id])
    # the near-dup growth actually merged (not singletons), and each
    # new member inherited its cluster's split
    assert v2[6] == v2[3]
    assert v2[7] == v2[4]
    assert v2[8][0] == 8  # novel doc forms its own cluster


def test_bpe_train_merges_hand_computed(spark):
    """3-round BPE on a corpus small enough to fold by hand — pins the
    weighted pair counts, the (count desc, pair asc) argmax, and the
    delimiter-safe merge application (consecutive 'a a a' merges
    greedily left-to-right: (aa)(a), not (a)(aa))."""
    from pyspark_recs.llmops.textstats import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_train_merges(docs, n_merges=3).collect()]
    assert rows == [
        (1, "a a", "aa", 4),   # aaab×2: two 'a a' pairs each
        (2, "a b", "ab", 3),   # after merge: aa|a|b ×2 plus a|b ×1
        (3, "aa ab", "aaab", 2),
    ]


def test_bpe_train_matches_pure_python_reference(spark):
    """Property check on randomized corpora: the distributed BPE
    trainer must equal an independent pure-Python implementation of
    the same spec (frequency-weighted pair counts, count-desc/pair-asc
    argmax, greedy left-to-right non-overlapping merge application) —
    pinning that the delimiter-safe string-replace fold really is the
    symbol-pairwise merge it claims to be."""
    import random

    from pyspark_recs.llmops.textstats import bpe_train_merges

    def ref_bpe(word_freqs, n_merges):
        forms = [(list(w), f) for w, f in sorted(word_freqs.items())]
        merges = []
        for rnd in range(1, n_merges + 1):
            counts = {}
            for syms, f in forms:
                for x, y in zip(syms, syms[1:]):
                    counts[(x, y)] = counts.get((x, y), 0) + f
            if not counts:
                break
            (a, b), c = min(
                counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
            )
            merges.append((rnd, f"{a} {b}", a + b, c))
            nxt = []
            for syms, f in forms:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nxt.append((out, f))
            forms = nxt
        return merges

    rng = random.Random(7)
    for trial in range(4):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        ]
        # repetition-heavy corpus so merges chain into multi-char tokens
        corpus = words * 2 + words[:10]
        freqs = {}
        for w in corpus:
            freqs[w] = freqs.get(w, 0) + 1
        docs = spark.createDataFrame(
            [(i, " ".join(corpus[i::3])) for i in range(3)],
            "doc_id long, text string",
        )
        got = [tuple(r) for r in bpe_train_merges(docs, n_merges=4).collect()]
        want = ref_bpe(freqs, 4)
        assert got == want, (trial, got, want)


def test_bpe_train_and_apply_survive_quotes_and_backslashes(spark):
    """Regression: learned merge symbols used to be f-string-interpolated
    into F.expr SQL, so a corpus where the best pair contains a single
    quote (English apostrophes: don't) or a backslash (C:\\x) raised a
    ParseException — or worse, silently mis-parsed the replace. Symbols
    now enter as Column literals; this corpus forces both characters
    into winning pairs."""
    from pyspark_recs.llmops.textstats import (
        bpe_apply_counts,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "n't n't n't n't"),
            (2, r"a\b a\b a\b"),
            (3, "n't a'b"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(docs, n_merges=3).collect()
    assert len(merges) == 3
    # round 1: (', t) and (n, ') both count 5; pair-asc tiebreak picks
    # "' t" (0x27 < 'n') — an apostrophe INSIDE the applied pattern.
    assert merges[0].pair == "' t" and merges[0].merged == "'t"
    assert merges[1].pair == "n 't" and merges[1].merged == "n't"
    assert any("\\" in m.pair for m in merges), "backslash pair never won"
    out = {
        r.doc_id: (r.n_char_symbols, r.n_bpe_symbols)
        for r in bpe_apply_counts(docs, merges).collect()
    }
    # doc 1: 4 words x 3 chars = 12 char symbols; "n't" fully merges
    # round-1 (n')+t then round-? ... at minimum one merge applied/word.
    assert out[1][0] == 12 and out[1][1] < 12
    assert out[2][0] == 9 and out[2][1] < 9


def test_lsh_topk_deterministic_rejects_wrong_dimension(spark):
    """Regression: a vector whose length differs from in_dim used to
    silently vanish (zip_with null-padded the projection); now it is a
    hard runtime error naming the expected dimension."""
    import pytest
    from pyspark_recs.llmops.similarity import lsh_topk_deterministic

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    ok = lsh_topk_deterministic(
        emb, emb.filter("vec_id < 2"), k=2, in_dim=8
    )
    assert ok.count() > 0  # correct dim: works end to end

    with pytest.raises(Exception, match="dimension"):
        lsh_topk_deterministic(
            emb, emb.filter("vec_id < 2"), k=2, in_dim=64
        ).collect()


def test_mixture_sample_upweights_small_sources(spark):
    """Temperature α=0.5: a source with 1/100 the char mass of another
    must get ~1/10 (not 1/100) of the sampled mass share — the whole
    point of sqrt-tempered mixing. Also: budget roughly hit, and the
    per-source digest is partition-invariant (no RNG anywhere)."""
    from pyspark_recs.workloads.llmops import l75_mixture_sample

    out = l75_mixture_sample(spark, "/root/testdata/sf0.001").collect()
    by_src = {r.source: r for r in out}
    total = sum(r.n_sampled for r in out)
    # T=200 budget, integer-threshold rounding + per-doc hash noise
    assert 120 <= total <= 280, total
    # every source is represented in the audit (even if 0 sampled)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert set(by_src) == {
        r.source for r in docs.select("source").distinct().collect()
    }
    again = {
        (r.source, r.sample_digest)
        for r in l75_mixture_sample(spark, "/root/testdata/sf0.001").collect()
    }
    assert {(r.source, r.sample_digest) for r in out} == again


def test_mixture_sample_sqrt_tempering_vs_proportional(spark):
    """Planted skew: source A has 10_000x the mass of B. Proportional
    sampling would give B ~0.01% of picks; sqrt tempering gives B
    ~1/101 of the q-mass. Verify the integer thresholds encode that."""
    import pyspark.sql.functions as F
    from pyspark_recs.workloads.llmops import l75_mixture_sample  # noqa: F401

    # reproduce the threshold arithmetic on a 2-source frame
    df = spark.createDataFrame(
        [(i, "A", 10_000) for i in range(100)]
        + [(100 + i, "B", 1) for i in range(100)],
        "doc_id long, source string, n_chars long",
    )
    stats = df.groupBy("source").agg(
        F.sum("n_chars").alias("w"), F.count(F.lit(1)).alias("n_s")
    )
    q = stats.select(
        "source",
        "n_s",
        F.floor(F.sqrt(F.col("w").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    rows = {r.source: r.q for r in q.collect()}
    # sqrt(1e6)/sqrt(1e2) = 100: tempered ratio is 100x, not 10_000x
    assert rows["A"] == 100 * rows["B"]


# ---------------------------------------------------------------- S11 real
def test_png_codec_roundtrip_all_filters():
    """llmops/png.py is a REAL codec: encode->decode round-trips raw
    pixels bit-exactly for gray/RGB/RGBA, and the decoder reconstructs
    scanlines written with every PNG filter type (1-4), which libpng
    emits but our filter-0 encoder never does — proving the decode path
    handles foreign PNGs, not just its own output."""
    import random
    import struct
    import zlib

    from pyspark_recs.llmops.png import decode_png, encode_png, synth_pixels

    px = synth_pixels(7)
    assert decode_png(encode_png(8, 8, px, 1)) == (8, 8, 1, px)
    rng = random.Random(1)
    for ch in (3, 4):
        raw = bytes(rng.randrange(256) for _ in range(5 * 3 * ch))
        assert decode_png(encode_png(5, 3, raw, ch))[3] == raw

    # hand-build a PNG using filters Sub/Up/Average/Paeth per row
    w, h, ch = 6, 5, 3
    stride = w * ch
    px = bytes(rng.randrange(256) for _ in range(stride * h))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rows = []
    for y in range(h):
        f = [1, 2, 3, 4, 0][y]
        filt = bytearray(stride)
        for x in range(stride):
            cur = px[y * stride + x]
            left = px[y * stride + x - ch] if x >= ch else 0
            up = px[(y - 1) * stride + x] if y else 0
            ul = px[(y - 1) * stride + x - ch] if (y and x >= ch) else 0
            pred = {
                0: 0, 1: left, 2: up, 3: (left + up) // 2,
                4: paeth(left, up, ul),
            }[f]
            filt[x] = (cur - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(data)[3] == px


def test_fetch_payloads_real_http_loopback(spark):
    """S11 against a REAL socket (the VERDICT r5 gap): a loopback
    http.server serves genuine PNG bytes with injected failures, and
    ``fetch_payloads`` drives the production ``http_fetcher`` (stdlib
    urllib) from executor threads — so retry (real 503), dead-letter
    (real 404), and decode (real zlib/filter PNG parse) are all
    exercised end to end over TCP, mirroring the reference's
    requests-based loop (app_utils.py:14-20)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from pyspark_recs.llmops.multimodal import (
        decode_image_payloads,
        fetch_payloads,
        http_fetcher,
    )
    from pyspark_recs.llmops.png import encode_png, synth_pixels

    seen: dict[int, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            asset_id = int(self.path.rsplit("/", 1)[1].split(".")[0])
            with lock:
                attempt = seen.get(asset_id, 0)
                seen[asset_id] = attempt + 1
            if asset_id % 13 == 0:
                self.send_error(404, "permanently missing")
                return
            if asset_id % 11 == 0 and attempt == 0:
                self.send_error(503, "transient")
                return
            body = encode_png(8, 8, synth_pixels(asset_id), 1)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        ids = [7, 11, 13, 22, 30]
        df = spark.createDataFrame(
            [(i, f"http://127.0.0.1:{port}/{i}.png") for i in ids],
            "doc_id bigint, url string",
        )
        fetched = fetch_payloads(df, fetcher=http_fetcher(timeout=5.0))
        rows = {r.doc_id: r for r in fetched.collect()}
        assert rows[7].status == "ok" and rows[7].n_attempts == 1
        assert rows[11].status == "ok" and rows[11].n_attempts == 2
        assert rows[22].status == "ok" and rows[22].n_attempts == 2
        assert rows[13].status == "dead_letter" and rows[13].payload is None
        assert rows[13].n_attempts == 3  # exhausted retries on real 404s

        decoded = {
            r.doc_id: r
            for r in decode_image_payloads(
                fetched.filter(F.col("status") == "ok")
            ).collect()
        }
        for i in (7, 11, 22, 30):
            assert (decoded[i].width, decoded[i].height) == (8, 8)
            assert decoded[i].pixel_sum == sum(synth_pixels(i))
    finally:
        server.shutdown()
        server.server_close()


def test_decode_image_payloads_dead_letters_bad_bytes(spark):
    """Undecodable payloads surface as decode_error rows with NULL
    facts — same side-table contract as fetch failures."""
    from pyspark_recs.llmops.multimodal import decode_image_payloads
    from pyspark_recs.llmops.png import encode_png, synth_pixels

    good = encode_png(8, 8, synth_pixels(3), 1)
    df = spark.createDataFrame(
        [(1, good), (2, good[:20]), (3, b"not a png")],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_payloads(df).collect()}
    assert rows[1].status == "ok" and rows[1].pixel_sum == sum(synth_pixels(3))
    assert rows[2].status == "decode_error" and rows[2].width is None
    assert rows[3].status == "decode_error"


def test_png_truncation_raises_valueerror_not_struct_error():
    # The documented dead-letter contract: ANY malformed buffer raises
    # ValueError (never struct.error) so callers can quarantine rows.
    import pytest as _pytest

    from pyspark_recs.llmops.png import decode_png, encode_png, synth_pixels

    data = encode_png(8, 8, synth_pixels(3), 1)
    for cut in (9, 12, 15, 20, len(data) // 2, len(data) - 3):
        with _pytest.raises(ValueError):
            decode_png(data[:cut])


def test_maxsim_late_interaction_hand_computed(spark):
    from pyspark_recs.llmops.similarity import maxsim_topk

    # 4-dim vectors read as 2 tokens of 2 dims. Query 0 = [e1 | e2].
    # doc 1 carries BOTH query tokens (maxsim 2.0), doc 2 only the
    # first (1.0), doc 3 has weak overlap everywhere (2 * 0.5) — late
    # interaction ranks 1 > 2 = 3, and a single-vector dot would have
    # called doc 3 (dot 1.0 after the split) equal to doc 1's tokens.
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 1.0]),
            (1, [1.0, 0.0, 0.0, 1.0]),
            (2, [1.0, 0.0, 1.0, 0.0]),
            (3, [0.5, 0.0, 0.0, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = maxsim_topk(
        vecs, vecs.filter(F.col("vec_id") == 0), k=3, n_tokens=2
    ).collect()
    by_rank = sorted(out, key=lambda r: r.rank)
    assert [r.neighbor_id for r in by_rank] == [1, 2, 3]
    assert by_rank[0].maxsim == 2.0
    # doc 2: token1 best-matches e1 (1.0), token2's best is also e1
    # column -> max(dot(e2,[1,0]), dot(e2,[1,0])) = 0 -> total 1.0
    assert by_rank[1].maxsim == 1.0
    assert by_rank[2].maxsim == 1.0  # 0.5 + 0.5
    assert all(r.query_id == 0 for r in out)


def test_maxsim_dim_guard_ragged_and_mismatch(spark):
    """ADVICE r10 (final form r11): the dim guard lives INSIDE the
    kernels — zero extra jobs, every row validated — so it must catch
    ragged vector lengths, a query/candidate dim mismatch, and
    non-divisible dims AT ACTION TIME in both impls. The raise comes
    from inside Spark execution (SparkRuntimeException for the expr
    assert, PythonException wrapping ValueError for arrow), so match
    on the contract message."""
    import pytest as _pytest

    from pyspark_recs.llmops.similarity import maxsim_topk

    ok4 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 1.0]), (1, [1.0, 0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q2 = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    for impl in ("expr", "arrow"):
        # non-divisible dim (both frames valid otherwise)
        with _pytest.raises(Exception, match="not divisible"):
            maxsim_topk(ok4, ok4, k=1, n_tokens=3, impl=impl).collect()
        # ragged candidates: the first QUERY row is clean, so the old
        # first-row probe passed — the kernel guard must not
        with _pytest.raises(Exception, match="ragged or mismatched"):
            maxsim_topk(ragged, ok4, k=1, n_tokens=2, impl=impl).collect()
        # query dim != candidate dim
        with _pytest.raises(Exception, match="ragged or mismatched"):
            maxsim_topk(ok4, q2, k=1, n_tokens=2, impl=impl).collect()


def test_maxsim_single_token_matches_plain_dot_ranking(spark):
    import random

    from pyspark_recs.llmops.similarity import maxsim_topk

    random.seed(29)
    data = [
        (i, [random.gauss(0, 1) for _ in range(8)]) for i in range(40)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in maxsim_topk(vecs, queries, k=5, n_tokens=1).collect()
    }
    # n_tokens=1 degenerates to exact dot-product ranking: recompute
    # driver-side from the same fixed-point quantization, INCLUDING the
    # array<float> storage truncation (float32) the engine sees.
    import math
    import struct

    def f32(v):
        return struct.unpack("f", struct.pack("f", v))[0]

    def fixed(a, b):
        return sum(
            math.floor(x * y * 1e12 + 0.5) for x, y in zip(a, b)
        )

    emb = {i: [f32(v) for v in vec] for i, vec in data}
    for q in range(3):
        scores = sorted(
            (
                (-fixed(emb[q], emb[c]), c)
                for c in emb
                if c != q
            ),
        )[:5]
        expect = [c for _, c in scores]
        assert [got[(q, r)] for r in range(1, 6)] == expect


def test_maxsim_arrow_and_expr_impls_bit_identical(spark):
    import random

    from pyspark_recs.llmops.similarity import maxsim_topk

    random.seed(31)
    data = [
        (i, [random.gauss(0, 1) for _ in range(16)]) for i in range(60)
    ]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    queries = vecs.filter(F.col("vec_id") < 4)

    def rows(impl):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.maxsim)
            for r in maxsim_topk(
                vecs, queries, k=5, n_tokens=4, impl=impl
            ).collect()
        )

    # The numpy float64 product + floor quantization must reproduce
    # the JVM fold exactly — scores AND ranks, not just the id sets.
    assert rows("arrow") == rows("expr")


def test_score_calibration_bins_partition_corpus(spark):
    from pyspark_recs.workloads.llmops import l92_score_calibration

    sf = "/root/testdata/sf0.001"
    rows = {r.bin: r for r in l92_score_calibration(spark, sf).collect()}
    total = sum(r.n_docs for r in rows.values())
    n_docs_table = 500
    assert total == n_docs_table  # every doc lands in exactly one bin
    for r in rows.values():
        assert 0 <= r.n_pos <= r.n_docs
        assert 0 <= r.pos_rate_ppm <= 1_000_000
        # interior bins: the mean score must sit inside the bin bounds
        if 0 < r.bin < 7:
            assert r.bin * 30000 <= r.mean_score < (r.bin + 1) * 30000
    # the diagram must be non-degenerate: multiple populated bins
    assert len(rows) >= 3


def test_curriculum_shards_balanced_and_score_ordered(spark):
    from pyspark_recs.workloads.llmops import l93_curriculum_shards

    sf = "/root/testdata/sf0.001"
    shards = {r.shard: r for r in l93_curriculum_shards(spark, sf).collect()}
    assert sorted(shards) == list(range(8))
    total = sum(r.shard_tokens for r in shards.values())
    # token-balanced within one max-document granularity
    from pyspark_recs.io import load_table
    from pyspark.sql import functions as FF

    max_doc = (
        load_table(spark, sf, "documents")
        .select(
            FF.size(
                FF.filter(FF.split("text", " "), lambda w: w != "")
            ).alias("n")
        )
        .agg(FF.max("n"))
        .first()[0]
    )
    for r in shards.values():
        assert abs(r.shard_tokens - total / 8) <= max_doc
    # curriculum order: shard s's tail score >= shard s+1's head score
    for s in range(7):
        assert shards[s].worst_score >= shards[s + 1].best_score


def test_cdc_chunks_insertion_robust_dedup(spark):
    from pyspark_recs.llmops.dedup import content_defined_chunks

    base = " ".join(f"tok{i % 23} word{i % 17}" for i in range(120))
    shifted = "Z " + base  # 2-char insertion at the front
    other = " ".join(f"other{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, base), (2, shifted), (3, other)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in content_defined_chunks(docs).collect()}
    # content-defined boundaries re-synchronize after an insertion:
    # most of doc 2's chunks are byte-identical to doc 1's, so the
    # keep-first dedup flags them — the property fixed-width segments
    # lack (every segment shifts by 2 chars and nothing matches).
    assert got[2].n_dup_chunks >= got[2].n_chunks // 2
    assert got[2].dup_ppm >= 500_000
    # disjoint content shares nothing
    assert got[3].n_dup_chunks == 0
    # chunk lengths account for every character
    assert (
        got[1].mean_chunk_len * got[1].n_chunks <= len(base)
    )


def test_canonicalize_url_hand_cases(spark):
    # The crawl canonicalizer, pinned case by case: scheme/host case,
    # www-strip, fragment drop, tracking-param strip (content params
    # kept in order), trailing-slash strip, emptied-query '?' drop.
    from pyspark_recs.llmops.urls import canonicalize_url

    cases = [
        ("HTTPS://WWW.Ex.COM/a/b", "https://ex.com/a/b"),
        ("https://ex.com/a/b/", "https://ex.com/a/b"),
        ("https://ex.com/a#frag", "https://ex.com/a"),
        ("https://ex.com/a?utm_source=x&page=2&ref=home",
         "https://ex.com/a?page=2"),
        ("https://ex.com/a?utm_campaign=x", "https://ex.com/a"),
        ("http://www.ex.com/a?fbclid=1&q=spark&gclid=2",
         "http://ex.com/a?q=spark"),
    ]
    df = spark.createDataFrame(cases, "raw string, expected string")
    rows = df.select("expected", canonicalize_url(df.raw).alias("got")).collect()
    for r in rows:
        assert r.got == r.expected, (r.got, r.expected)


def test_l95_canonicalizer_actually_merges_variants(spark):
    # The dedup must be non-vacuous: the synthetic corpus produces raw
    # variants that only canonicalization can merge, so some canonical
    # urls must carry n_variants > 1, and every kept_doc_id must be
    # the minimum of its group.
    from pyspark_recs.workloads.llmops import l95_url_canonical_dedup

    rows = l95_url_canonical_dedup(spark, "/root/testdata/sf0.001").collect()
    assert any(r.n_variants > 1 for r in rows)
    assert sum(r.n_variants for r in rows) == 500  # every doc accounted for
    assert all("?page=2" == r.canonical_url[-7:] or "?" not in r.canonical_url
               for r in rows)  # only content params survive


def test_l97_tone_power_matches_pure_python(spark):
    # One doc replayed end to end in pure Python: generate the PCM
    # from the synth formula, the oscillator tables from the integer
    # recurrence, and the magnitudes by direct summation — the Spark
    # row (real WAV decode + numpy dots) must match exactly, and the
    # oscillator's first values must equal the hand-derived ones.
    from pyspark_recs.llmops.multimodal import (
        TONE_PROBES,
        quantized_oscillator,
    )
    from pyspark_recs.workloads.llmops import l97_audio_tone_power

    c8, s8 = quantized_oscillator(256, 16069, 3196)
    assert (c8[0], c8[1]) == (16384, 16069)
    assert c8[2] == (2 * 16069 * 16069) // 16384 - 16384  # hand recurrence
    assert (s8[0], s8[1], s8[2]) == (0, 3196, (2 * 16069 * 3196) // 16384)

    doc_id = 1  # not % 17 == 0 — decodable branch
    x = [((doc_id * 37 + i * 11) % 4001) - 2000 for i in range(256)]
    expected = {}
    for k, a, b in TONE_PROBES:
        c, sn = quantized_oscillator(256, a, b)
        expected[f"mag_k{k}"] = abs(sum(v * cv for v, cv in zip(x, c))) + abs(
            sum(v * sv for v, sv in zip(x, sn))
        )
    rows = {
        r.doc_id: r
        for r in l97_audio_tone_power(spark, "/root/testdata/sf0.001").collect()
    }
    got = rows[doc_id]
    assert got.status == "ok"
    for key, val in expected.items():
        assert getattr(got, key) == val, (key, getattr(got, key), val)
    assert got.dominant_k == max(
        (expected[f"mag_k{k}"], -k) for k, _, _ in TONE_PROBES
    )[1] * -1
    assert rows[17].status == "decode_error" and rows[17].mag_k8 is None


def test_embedding_covariance_kernel_matches_expression_plan(spark):
    """r12-opt: the dim-known covariance path is a vectorized NumPy
    kernel (one mapInPandas pass emitting partial moment/first-moment
    sums). Its per-element quantization must replay the JVM expression
    floor(double(x)*double(y)*scale + 0.5) BIT-FOR-BIT, so the kernel
    plan (dim=...) and the expression plan (dim=None) must agree
    exactly — including negative values and irrational-ish floats."""
    import random

    from pyspark_recs.llmops.similarity import embedding_covariance

    rng = random.Random(44)
    rows = [
        (i, [rng.uniform(-2.0, 2.0) for _ in range(5)]) for i in range(37)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(4)
    expr_rows = {
        (r.i, r.j): (r.n, r.cov)
        for r in embedding_covariance(vecs).collect()
    }
    kern_rows = {
        (r.i, r.j): (r.n, r.cov)
        for r in embedding_covariance(vecs, dim=5).collect()
    }
    assert kern_rows == expr_rows  # exact, not approx: same fixed point
    assert len(kern_rows) == 5 * 6 // 2

    # Empty input stays empty (no zero-filled phantom triangle).
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_covariance(empty, dim=5).count() == 0

    # Dimension mismatch is a hard in-kernel error, not a mislabel.
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(Exception):
        embedding_covariance(bad, dim=5).collect()
