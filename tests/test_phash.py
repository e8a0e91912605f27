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


def test_augment_permutation_facts_2x2(spark):
    from pyspark_recs.llmops.multimodal import augment_image_payloads

    # 2x2 image [1,2 / 3,4]: rot90 cw -> [3,1 / 4,2], flip_h ->
    # [2,1 / 4,3]; pos_weighted_sum distinguishes the permutations
    png = encode_png(2, 2, bytes([1, 2, 3, 4]), 1)
    out = augment_image_payloads(
        spark.createDataFrame(
            [(1, bytearray(png)), (2, bytearray(png[:20]))],
            "doc_id long, payload binary",
        )
    ).collect()
    ok = {r.variant: r for r in out if r.doc_id == 1}
    assert {r.pixel_sum for r in ok.values()} == {10}
    assert ok["orig"].pos_weighted_sum == 1 * 1 + 2 * 2 + 3 * 3 + 4 * 4
    assert ok["rot90"].pos_weighted_sum == 1 * 3 + 2 * 1 + 3 * 4 + 4 * 2
    assert ok["flip_h"].pos_weighted_sum == 1 * 2 + 2 * 1 + 3 * 4 + 4 * 3
    err = [r for r in out if r.doc_id == 2]
    assert len(err) == 3  # uniform cardinality on dead-letter
    assert all(r.status == "decode_error" for r in err)


def test_audio_zcr_hand_computed(spark):
    from pyspark_recs.llmops.multimodal import audio_window_zcr
    from pyspark_recs.llmops.wav import encode_wav

    # window [5,-3,-2,7]: sign changes at 5->-3 and -2->7 -> zcr 2;
    # window [1,2,3,4]: zcr 0
    pcm = b"".join(
        v.to_bytes(2, "little", signed=True)
        for v in [5, -3, -2, 7, 1, 2, 3, 4]
    )
    good = encode_wav(8000, 1, pcm)
    rows = audio_window_zcr(
        spark.createDataFrame(
            [(1, bytearray(good))], "doc_id long, payload binary"
        ),
        window=4,
    ).collect()
    got = {r.win_idx: r.win_zcr for r in rows}
    assert got == {0: 2, 1: 0}


def test_vad_segments_randomized_differential(spark):
    """vad_segments vs an independent pure-Python island fold over 50
    seeded-random energy sequences — the run-length semantics, not
    just the hand-picked cases."""
    import random

    from pyspark_recs.llmops.multimodal import vad_segments

    rng = random.Random(20260815)
    docs = {
        d: [rng.randrange(0, 64_000) for _ in range(rng.randrange(1, 12))]
        for d in range(50)
    }
    win = spark.createDataFrame(
        [(d, "ok", i, e) for d, es in docs.items() for i, e in enumerate(es)],
        "doc_id long, status string, win_idx int, win_abs long",
    )
    got = {
        r.doc_id: (r.n_windows, r.n_active, r.n_segments, r.longest_run,
                   r.active_abs_sum)
        for r in vad_segments(win, 32_000).collect()
    }
    for d, es in docs.items():
        n_seg = longest = run = active = abs_sum = 0
        for e in es:
            if e >= 32_000:
                run += 1
                active += 1
                abs_sum += e
                if run == 1:
                    n_seg += 1
                longest = max(longest, run)
            else:
                run = 0
        assert got[d] == (len(es), active, n_seg, longest, abs_sum), d


def test_scene_cuts_hand_computed(spark):
    from pyspark_recs.llmops.multimodal import scene_cuts

    # lumas [100,120,500,510,100] at threshold 200: cuts at frames 2
    # and 4 -> 3 scenes of lengths [2,2,1]
    frames = spark.createDataFrame(
        [(1, "ok", i, v) for i, v in enumerate([100, 120, 500, 510, 100])],
        "doc_id long, status string, frame_idx int, luma_sum long",
    )
    (r,) = scene_cuts(frames, threshold=200).collect()
    assert (r.n_frames, r.n_cuts, r.n_scenes, r.longest_scene_frames) == (
        5, 2, 3, 2,
    )


def test_video_frame_lumas_round_trip(spark):
    from pyspark_recs.llmops.multimodal import video_frame_lumas
    from pyspark_recs.llmops.y4m import encode_y4m

    # 3 frames of 2x2 mono with constant lumas 10, 10, 200
    clip = encode_y4m(
        2, 2, [bytes([v] * 4) for v in (10, 10, 200)]
    )
    rows = video_frame_lumas(
        spark.createDataFrame(
            [(1, bytearray(clip)), (2, bytearray(clip[:-3]))],
            "doc_id long, payload binary",
        )
    ).collect()
    ok = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.luma_sum) for r in ok] == [
        (0, 40), (1, 40), (2, 800),
    ]
    (err,) = [r for r in rows if r.doc_id == 2]
    assert err.status == "decode_error" and err.frame_idx is None
