"""Pure-stdlib Y4M (YUV4MPEG2) video-container codec: the standard
uncompressed video interchange format (ffmpeg/x264/VP9 toolchains).
Mono (luma-only) and 4:2:0/4:4:4 planar frames, frame-accurate
seeking by arithmetic (fixed frame size), with the PNG/JPEG/WAV
dead-letter contract (ValueError on truncation or unsupported
variants).

Completes the multimodal family's REAL-codec coverage: image (PNG
l76, JPEG l77), audio (WAV l78) and now VIDEO (Y4M l79). Uncompressed
frames mean decode is exact for arbitrary content — the l79 oracle is
a straight SQL reformulation of the synthesis formula, the same
discipline as the other three. Real frame SAMPLING falls out of the
container's fixed-size-frame property: sampling every k-th frame is a
seek, not a scan, which is exactly how a production pipeline thins
video before feature extraction. Swap these functions for
ffmpeg/PyAV to add compressed codecs — the Arrow seam, schema and
batch shape don't change.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"
# colorspace -> chroma bytes per luma byte numerator/denominator
_PLANES = {b"mono": (0, 1), b"420": (1, 2), b"444": (2, 1)}


def encode_y4m(
    width: int, height: int, frames, colorspace: str = "mono"
) -> bytes:
    """Encode raw planar frames into a Y4M stream. ``frames`` is a
    sequence of byte buffers, each one frame: the luma plane followed
    by the chroma planes the colorspace requires (mono = luma only)."""
    if width <= 0 or height <= 0:
        raise ValueError("empty frame geometry")
    cs = colorspace.encode()
    if cs not in _PLANES:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    num, den = _PLANES[cs]
    frame_len = width * height + (width * height * num) // den
    out = bytearray(
        _MAGIC + b" W%d H%d F25:1 Ip A1:1 C%s\n" % (width, height, cs)
    )
    for f in frames:
        if len(f) != frame_len:
            raise ValueError(
                f"frame is {len(f)} bytes, expected {frame_len}"
            )
        out += b"FRAME\n"
        out += f
    return bytes(out)


def parse_header(data: bytes):
    """Parse the stream header; returns (width, height, colorspace,
    header_end_offset)."""
    if len(data) < len(_MAGIC) or data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.find(b"\n", 0, 256)
    if nl < 0:
        raise ValueError("truncated Y4M (no header terminator)")
    width = height = None
    cs = b"420"  # the format's default when C is absent
    for tok in data[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            # C420jpeg/C420paldv carry the same plane sizes as C420
            base = val.rstrip(b"jpegpaldv") or val
            if base not in _PLANES:
                raise ValueError(f"unsupported colorspace C{val.decode()}")
            cs = base
        # F (rate), I (interlacing), A (aspect), X (comment): metadata
        # only — plane sizes don't depend on them
    if not width or not height:
        raise ValueError("Y4M header missing W or H")
    return width, height, cs.decode(), nl + 1


def frame_geometry(width: int, height: int, colorspace: str):
    """(frame_len, luma_len) for one frame of the given geometry."""
    num, den = _PLANES[colorspace.encode()]
    luma = width * height
    return luma + (luma * num) // den, luma


def decode_y4m(data: bytes, sample_every: int = 1):
    """Decode a Y4M stream into (width, height, colorspace, n_frames,
    sampled_lumas) where ``sampled_lumas`` is the list of raw LUMA
    planes of frames 0, k, 2k, ... (``sample_every=k``) — frame
    sampling by SEEK: non-sampled frames are skipped by arithmetic
    (fixed frame size), never materialized. Every frame boundary is
    still validated (each must start with a FRAME marker), so a
    truncated or corrupt tail raises even when unsampled."""
    if sample_every < 1:
        raise ValueError("sample_every must be >= 1")
    width, height, cs, pos = parse_header(data)
    frame_len, luma_len = frame_geometry(width, height, cs)
    sampled = []
    n = 0
    while pos < len(data):
        nl = data.find(b"\n", pos, pos + 64)
        if nl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        # parameters may follow "FRAME" before the newline; plane
        # sizes don't depend on them
        body = nl + 1
        if body + frame_len > len(data):
            raise ValueError("truncated Y4M (frame body cut)")
        if n % sample_every == 0:
            sampled.append(data[body:body + luma_len])
        n += 1
        pos = body + frame_len
    if n == 0:
        raise ValueError("Y4M stream has no frames")
    return width, height, cs, n, sampled


def synth_frames(doc_id: int, n_frames: int = 12, side: int = 16):
    """Deterministic mono test clip: frame f is CONSTANT luma
    (doc_id*13 + f*29) mod 256. SQL-expressible (the l79 oracle
    recomputes sampled luma sums from the formula alone — the
    synth_pixels/synth_pcm discipline)."""
    return [
        bytes([(doc_id * 13 + f * 29) % 256]) * (side * side)
        for f in range(n_frames)
    ]
