"""Pure-stdlib WAV (RIFF/PCM) codec: 16-bit integer PCM, mono or
multi-channel, with the PNG/JPEG dead-letter contract (ValueError on
anything truncated or outside the supported subset).

Extends the multimodal family's REAL-codec coverage to AUDIO: PCM is
uncompressed, so — unlike JPEG — decode is exact for arbitrary
content, which makes the l78 oracle a straight SQL reformulation of
the synthesis formula. The reference's multimodal surface is
image-first (app_utils.py:14-26), but a 100 TB training-data pipeline
treats audio the same way: opaque binary column in, typed facts
(sample rate, channels, duration, amplitude stats) out, decode running
partition-parallel inside one Arrow batch pass, payload bytes never
shuffled. Swap these functions for soundfile/ffmpeg to widen format
support (float PCM, compressed codecs) — the seam, schema and batch
shape don't change.
"""

from __future__ import annotations

import struct


def encode_wav(
    sample_rate: int, channels: int, samples: bytes
) -> bytes:
    """Encode raw little-endian int16 PCM frames (interleaved if
    ``channels`` > 1) into a canonical RIFF/WAVE file: one ``fmt ``
    chunk (PCM, 16-bit) and one ``data`` chunk."""
    if channels < 1 or channels > 64:
        raise ValueError("channels must be in [1, 64]")
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    if len(samples) % (2 * channels):
        raise ValueError("sample buffer is not whole int16 frames")
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM format tag
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Decode a RIFF/WAVE file into (sample_rate, channels, n_frames,
    pcm bytes). Supports 16-bit integer PCM (format tag 1); float PCM,
    ADPCM, extensible formats, other bit depths, and any truncation
    raise ValueError (callers dead-letter the row — the PNG/JPEG
    contract). Unknown chunks (LIST/INFO, fact, cue) are skipped the
    way the spec requires: by their declared, word-aligned length."""
    if len(data) < 12:
        raise ValueError("truncated WAV (no RIFF header)")
    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated WAV (RIFF length exceeds buffer)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body_end = pos + 8 + length
        if body_end > len(data):
            raise ValueError(f"truncated WAV ({tag!r} chunk cut)")
        body = data[pos + 8:body_end]
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("truncated WAV (fmt chunk < 16 bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
            break  # canonical files end with data; stop at the first
        pos = body_end + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    format_tag, channels, sample_rate, _rate, block_align, bits = fmt
    if format_tag != 1:
        raise ValueError(
            f"unsupported WAV format tag {format_tag} (integer PCM only)"
        )
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
    if channels < 1 or block_align != 2 * channels:
        raise ValueError("inconsistent fmt chunk")
    if len(pcm) % block_align:
        raise ValueError("PCM data is not whole frames")
    return sample_rate, channels, len(pcm) // block_align, pcm


def pcm_facts(pcm: bytes):
    """(sum, sum of absolute values, min, max) over the int16 samples
    — exact integer audio-amplitude facts, the audio analog of the
    image codecs' pixel_sum."""
    import array

    a = array.array("h")
    a.frombytes(pcm)
    # array('h') is little-endian on every platform this runs on only
    # if the host is little-endian; normalize explicitly otherwise
    import sys

    if sys.byteorder == "big":  # pragma: no cover
        a.byteswap()
    total = 0
    abs_total = 0
    lo, hi = 32767, -32768
    for v in a:
        total += v
        abs_total += v if v >= 0 else -v
        if v < lo:
            lo = v
        if v > hi:
            hi = v
    if not len(a):
        lo = hi = 0
    return total, abs_total, lo, hi


def synth_pcm(doc_id: int, n_frames: int = 256) -> bytes:
    """Deterministic int16 test signal: sample[i] =
    ((doc_id*37 + i*11) mod 4001) - 2000. SQL-expressible (the l78
    oracle recomputes every amplitude fact from this formula alone —
    the synth_pixels/synth_tile_pixels discipline)."""
    return b"".join(
        struct.pack("<h", ((doc_id * 37 + i * 11) % 4001) - 2000)
        for i in range(n_frames)
    )
