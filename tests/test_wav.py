"""RIFF/PCM WAV codec (llmops/wav.py) — the audio member of the
real-codec family (PNG l76, JPEG l77, WAV l78), with the same
dead-letter contract (ValueError on truncation / unsupported
variants)."""

from __future__ import annotations

import struct

import pytest

from pyspark_recs.llmops.wav import (
    decode_wav,
    encode_wav,
    pcm_facts,
    synth_pcm,
)


def test_roundtrip_is_exact():
    # PCM is uncompressed: encode->decode is bit-exact for ANY content
    for doc_id in (0, 1, 7, 12345):
        pcm = synth_pcm(doc_id)
        rate, ch, n, out = decode_wav(encode_wav(8000, 1, pcm))
        assert (rate, ch, n) == (8000, 1, 256)
        assert out == pcm


def test_multichannel_frames():
    pcm = struct.pack("<6h", 1, -1, 2, -2, 3, -3)  # 3 stereo frames
    rate, ch, n, out = decode_wav(encode_wav(44100, 2, pcm))
    assert (rate, ch, n) == (44100, 2, 3)
    assert out == pcm
    with pytest.raises(ValueError):
        encode_wav(44100, 2, pcm[:-2])  # not whole stereo frames


def test_pcm_facts_match_formula():
    # The l78 oracle recomputes these from the synth formula — pin the
    # Python side to it.
    for doc_id in (3, 999):
        pcm = synth_pcm(doc_id)
        total, abs_total, lo, hi = pcm_facts(pcm)
        vals = [((doc_id * 37 + i * 11) % 4001) - 2000 for i in range(256)]
        assert total == sum(vals)
        assert abs_total == sum(abs(v) for v in vals)
        assert lo == min(vals) and hi == max(vals)


def test_unknown_chunks_are_skipped():
    # A LIST/INFO chunk between fmt and data must be walked over by
    # declared length (word-aligned), as the RIFF spec requires.
    pcm = synth_pcm(5)
    wav = bytearray(encode_wav(8000, 1, pcm))
    i = bytes(wav).find(b"data")
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len, padded
    patched = bytes(wav[:i]) + info + bytes(wav[i:])
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    rate, ch, n, out = decode_wav(patched)
    assert (rate, ch, n) == (8000, 1, 256)
    assert out == pcm


def test_truncation_raises_valueerror_at_every_cut_point():
    data = encode_wav(8000, 1, synth_pcm(5))
    for cut in (0, 3, 8, 11, 20, 30, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_wav(data[:cut])


def test_unsupported_variants_rejected():
    data = bytearray(encode_wav(8000, 1, synth_pcm(5)))
    i = bytes(data).find(b"fmt ")
    # format tag 3 = IEEE float PCM
    flt = bytearray(data)
    flt[i + 8:i + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(flt))
    # 24-bit depth
    b24 = bytearray(data)
    b24[i + 22:i + 24] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(bytes(b24))
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")
    with pytest.raises(ValueError):
        encode_wav(0, 1, b"")


def test_decode_audio_payloads_dead_letters(spark):
    from pyspark_recs.llmops.multimodal import decode_audio_payloads

    good = encode_wav(8000, 1, synth_pcm(3))
    df = spark.createDataFrame(
        [(1, good), (2, good[:30]), (3, b"not audio")],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in decode_audio_payloads(df).collect()}
    total, abs_total, _, _ = pcm_facts(synth_pcm(3))
    assert rows[1].status == "ok"
    assert (rows[1].sample_rate, rows[1].channels, rows[1].n_frames) == (
        8000, 1, 256,
    )
    assert rows[1].amp_sum == total and rows[1].amp_abs_sum == abs_total
    assert rows[2].status == "decode_error" and rows[2].amp_sum is None
    assert rows[3].status == "decode_error"
