"""Unit tests for perceptual average-hash over real-decoded images:
bit rule, 8x8 block pooling on larger images, dead-letter contract,
and the byte-distinct-but-perceptually-identical property l83 relies
on."""

from __future__ import annotations

from pyspark_recs.llmops.multimodal import image_ahash
from pyspark_recs.llmops.png import encode_png


def _hash_rows(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    return {r.doc_id: r for r in image_ahash(df).collect()}


def test_ahash_bit_rule_8x8(spark):
    # first 32 pixels dark (10), last 32 bright (200): mean 105 ->
    # exactly the high half sets bits; hi = all 32 bits, lo = 0
    px = bytes([10] * 32 + [200] * 32)
    rows = _hash_rows(spark, [encode_png(8, 8, px, 1)])
    r = rows[0]
    assert r.status == "ok" and r.n_pixels == 64
    assert r.phash_lo == 0
    assert r.phash_hi == (1 << 32) - 1


def test_ahash_block_pooling_16x16(spark):
    # 16x16 image, top half dark / bottom half bright: 2x2 blocks pool
    # to the same split as the 8x8 case
    px = bytes([10] * 128 + [200] * 128)
    rows = _hash_rows(spark, [encode_png(16, 16, px, 1)])
    r = rows[0]
    assert r.status == "ok" and r.n_pixels == 256
    assert r.phash_lo == 0 and r.phash_hi == (1 << 32) - 1


def test_ahash_constant_image_all_zero_bits(spark):
    # strict '>' means a flat image (every pixel == mean) hashes to 0
    rows = _hash_rows(spark, [encode_png(8, 8, bytes([7] * 64), 1)])
    assert (rows[0].phash_hi, rows[0].phash_lo) == (0, 0)


def _hamming(a, b):
    return bin(
        ((a.phash_hi ^ b.phash_hi) << 32) | (a.phash_lo ^ b.phash_lo)
    ).count("1")


def test_ahash_dead_letter_and_noise_robustness(spark):
    # same base pattern under two different +/-3 noise fields: payloads
    # are byte-distinct (md5 dedup is blind) but the hashes stay within
    # a small Hamming ball — only bits whose base pixel sits at the
    # mean boundary can flip. A different base pattern lands far away.
    base = [((3 * 31) + i * 7) % 256 for i in range(64)]
    other = [((9 * 31) + i * 7) % 256 for i in range(64)]
    noisy_a = bytes(min(255, max(0, p + (i % 7) - 3)) for i, p in enumerate(base))
    noisy_b = bytes(min(255, max(0, p + ((i * 5) % 7) - 3)) for i, p in enumerate(base))
    png_a = encode_png(8, 8, noisy_a, 1)
    png_b = encode_png(8, 8, noisy_b, 1)
    png_c = encode_png(8, 8, bytes(other), 1)
    assert png_a != png_b  # byte-distinct payloads (md5 dedup blind)
    rows = _hash_rows(spark, [png_a, png_b, png_c, png_a[:20]])
    assert _hamming(rows[0], rows[1]) <= 4
    assert _hamming(rows[0], rows[2]) > 4
    assert rows[3].status == "decode_error"
    assert rows[3].phash_hi is None and rows[3].phash_lo is None
