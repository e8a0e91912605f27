"""Train the TEXT tower checkpoint (llmops/models/tiny_text_encoder.npz).

Distillation into the image tower's space, fully offline and seeded:
for asset ids 0..99999 with ``id % 7 != 0`` (the % 7 == 0 cohort is
HELD OUT to verify generalization), the prompt ``"photo of asset <id>"``
is trained to land on the image tower's embedding of that asset's
payload bytes (the synthesized URL — what ``fake_http_fetcher``
returns). Ids 0..9999 are oversampled 10x so short-id prompts (the
test corpora's doc_id range) are in-distribution, not tail cases.
Model: 64 -> 64 tanh -> 16 float32 MLP, cycle-padded byte features,
cosine-regression loss, full-batch Adam, numpy only.

Measured with seed 0 / 500 epochs (re-run this script to reproduce
bit-identically):
- held-out ids (% 7 == 0, never trained): matched cosine mean 0.9998,
  p1 0.9996 — the fit generalizes across unseen ids
- corpus-shaped pools: matched cosine mean 0.9949 at 500 docs, 0.9994
  at 5000 — vs 0.9785 for the best CONSTANT tower (the image-cloud
  center) and ~0.08 for a random tower, which is why l74 gates on
  matched mean >= 0.99: only a trained text tower clears it
- open-vocabulary semantics are NOT claimed: the synthetic asset bytes
  are hash-like in the id, so rank-1 retrieval among the near-collinear
  image embeddings is not meaningful (and margin-vs-mismatch statistics
  are noise-dominated — a lucky random tower beats them). Absolute
  matched distillation fidelity is the honest verifiable property.
  Real CLIP towers swap in through the same two-checkpoint seam.

Usage: python tools/train_text_tower.py [out.npz]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark_recs.llmops.encoder import TinyMLPEncoder  # noqa: E402

IN_DIM = 64
HIDDEN = 64
SEED = 0
EPOCHS = 500
LR = 3e-3


def prep_cycle(b: bytes, d: int = IN_DIM) -> np.ndarray:
    return np.resize(np.frombuffer(b, dtype=np.uint8), d).astype(
        np.float32
    ) / np.float32(255.0)


def image_embed(enc: TinyMLPEncoder, ids) -> np.ndarray:
    x = np.stack(
        [prep_cycle(f"https://img.example.com/{i}.jpg".encode()) for i in ids]
    )
    h = np.tanh(x @ enc.w1 + enc.b1)
    y = h @ enc.w2 + enc.b2
    return y / np.maximum(np.sqrt((y * y).sum(1, keepdims=True)), 1e-12)


def text_feats(ids) -> np.ndarray:
    return np.stack([prep_cycle(f"photo of asset {i}".encode()) for i in ids])


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            REPO, "pyspark_recs", "llmops", "models", "tiny_text_encoder.npz"
        )
    )
    enc = TinyMLPEncoder()
    rng = np.random.default_rng(SEED)
    base = [i for i in range(100_000) if i % 7 != 0]
    small = [i for i in range(10_000) if i % 7 != 0]
    train_ids = np.array(base + small * 9)  # short ids weighted 10x
    y = image_embed(enc, train_ids)
    x = text_feats(train_ids)

    w1 = rng.normal(0, 0.5, (IN_DIM, HIDDEN)).astype(np.float32)
    b1 = np.zeros(HIDDEN, np.float32)
    w2 = rng.normal(0, 0.1, (HIDDEN, 16)).astype(np.float32)
    b2 = np.zeros(16, np.float32)
    params = [w1, b1, w2, b2]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    n = len(x)
    t0 = time.time()
    for epoch in range(1, EPOCHS + 1):
        h = np.tanh(x @ w1 + b1)
        z = h @ w2 + b2
        zn = np.sqrt((z * z).sum(1, keepdims=True))
        zu = z / np.maximum(zn, 1e-12)
        cos = (zu * y).sum(1)
        dz = -(y - cos[:, None] * zu) / np.maximum(zn, 1e-12) / n
        gw2 = h.T @ dz
        gb2 = dz.sum(0)
        dh = dz @ w2.T * (1 - h * h)
        gw1 = x.T @ dh
        gb1 = dh.sum(0)
        for p, g, mi, vi in zip(params, [gw1, gb1, gw2, gb2], m, v):
            mi *= beta1
            mi += (1 - beta1) * g
            vi *= beta2
            vi += (1 - beta2) * g * g
            p -= LR * (mi / (1 - beta1**epoch)) / (
                np.sqrt(vi / (1 - beta2**epoch)) + eps
            )
        if epoch % 100 == 0:
            print(
                f"epoch {epoch} loss {(1 - cos).mean():.5f}"
                f" ({time.time() - t0:.0f}s)"
            )

    # held-out generalization report (% 7 == 0 never trained)
    held = [i for i in range(100_000) if i % 7 == 0][:5000]
    yh = image_embed(enc, held)
    xh = text_feats(held)
    h = np.tanh(xh @ w1 + b1)
    z = h @ w2 + b2
    zu = z / np.maximum(np.sqrt((z * z).sum(1, keepdims=True)), 1e-12)
    ch = (zu * yh).sum(1)
    print(
        f"held-out matched cos: mean {ch.mean():.4f}"
        f" p1 {np.quantile(ch, 0.01):.4f} min {ch.min():.4f}"
    )
    np.savez(
        out_path,
        w1=w1.astype(np.float32),
        b1=b1.astype(np.float32),
        w2=w2.astype(np.float32),
        b2=b2.astype(np.float32),
    )
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
