"""Optional-dependency integration test for the pluggable encoder seam.

The engine's multimodal path (pyspark_recs/llmops/multimodal.py) ships a
deterministic stand-in encoder; this test swaps in a real public model
(sentence-transformers) through the same batched contract — mirroring the
reference's CLIP usage (reference src/app_utils.py:10-26) — and is skipped
wherever the dependency is absent (this sandbox has no model weights or
network).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyspark_recs.llmops.multimodal import encode_payloads


def test_real_model_through_encoder_seam(spark):
    st = pytest.importorskip("sentence_transformers")
    model = st.SentenceTransformer("all-MiniLM-L6-v2")

    def real_encoder(payloads):
        # Batched contract: sequence of byte payloads in, one vector (or
        # None) per payload out — identical to tiny_image_encoder's shape.
        texts = [p.decode("utf-8", "ignore") if p else "" for p in payloads]
        embs = model.encode(texts, normalize_embeddings=True)
        return [[float(x) for x in e] for e in embs]

    docs = spark.createDataFrame(
        [(1, b"a red summer dress"), (2, b"leather ankle boots")],
        "doc_id long, payload binary",
    )
    out = encode_payloads(docs, encoder=real_encoder).collect()
    assert {r.doc_id for r in out} == {1, 2}
    for r in out:
        norm = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(norm - 1.0) < 1e-3
