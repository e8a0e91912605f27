"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81 subset): 8-bit
baseline sequential DCT, grayscale or YCbCr 4:4:4, standard Annex-K
Huffman tables, no restart intervals, no progressive scans.

Closes the round-8 JPEG-stub decision (VERDICT item #7) the same way
png.py closed S11: a REAL codec — real bitstream, real Huffman entropy
coding with byte stuffing, real 2-D DCT/IDCT and quantization — behind
the exact seam ``decode_image_payloads`` already exposes, so swapping
in libjpeg/PIL changes only the function body inside the pandas UDF,
never a Spark seam. Anything outside the supported subset raises
ValueError and the caller dead-letters the row (the PNG contract).

Reference behavior being made real: the reference fetches image bytes
over HTTP and hands them to a model (``/root/reference/src/
app_utils.py:14-26``, ``src/my_merlin_flow.py:586-599``) — .jpg URLs
included.

Exactness property used by the l77 oracle query: at ``quality=100``
every quantizer is 1, so an image built from 8x8 CONSTANT tiles
round-trips EXACTLY — a constant level-shifted block has a single
integer DCT coefficient, DC = 8*(v-128), and the float IDCT of a pure
DC block is the constant DC/8 with no rounding freedom. The codec
stays honestly lossy for general content (see the quality-75 tests).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 2-D DCT basis: F = M f M^T, f = M^T F M; for a constant
# level-shifted block v the only nonzero coefficient is DC = 8v.
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quant_tables(quality: int):
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 7 - ((self.nbits + 7) % 8))  # pad with 1s
            if self.nbits:  # exactly one residual byte
                self.nbits = 0
        return bytes(self.out)


def _build_codes(bits, values):
    """(symbol -> (code, length)) from a DHT (bits, values) spec —
    canonical Huffman code assignment (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _dht_body(tc_th: int, bits, values) -> bytes:
    return bytes([tc_th] + list(bits) + list(values))


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _encode_component(
    writer: _BitWriter, plane: np.ndarray, q: np.ndarray,
    dc_codes, ac_codes, pred: int,
) -> int:
    """Entropy-encode one component plane (already level-shifted,
    padded to 8-multiples) block by block; returns the new DC
    predictor."""
    h, w = plane.shape
    qm = q.reshape(8, 8)  # q is natural-order (Annex K layout)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            f = _M @ plane[by:by + 8, bx:bx + 8] @ _M.T
            coef = np.floor(f / qm + 0.5).astype(np.int64)
            zz = coef.reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _size_of(diff)
            code, ln = dc_codes[s]
            writer.write(code, ln)
            if s:
                amp = diff if diff > 0 else diff + (1 << s) - 1
                writer.write(amp, s)
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                s = _size_of(v)
                code, ln = ac_codes[(run << 4) | s]
                writer.write(code, ln)
                amp = v if v > 0 else v + (1 << s) - 1
                writer.write(amp, s)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                writer.write(code, ln)
    return pred


def encode_jpeg(
    width: int, height: int, pixels: bytes, channels: int = 1,
    quality: int = 75,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` in {1, 3}) into
    a real baseline JPEG: SOI/APP0/DQT/SOF0/DHT/SOS markers, Annex-K
    Huffman entropy coding with byte stuffing, 4:4:4 (no subsampling,
    so dimensions needn't be multiples of 8 — edges pad by replication,
    the standard encoder practice)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if width == 0 or height == 0:
        raise ValueError("empty image")
    ql, qc = _quant_tables(quality)
    px = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    px = px.astype(np.float64)
    planes = (
        [px[..., 0]] if channels == 1
        else list(np.moveaxis(_rgb_to_ycbcr(px), -1, 0))
    )
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT carries the table in ZIGZAG order (T.81 B.2.4.1); the
    # in-memory tables are natural-order Annex K layout
    out += _marker(
        0xDB, bytes([0]) + bytes(int(ql[ZIGZAG[i]]) for i in range(64))
    )
    if channels == 3:
        out += _marker(
            0xDB, bytes([1]) + bytes(int(qc[ZIGZAG[i]]) for i in range(64))
        )
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    out += _marker(0xC4, _dht_body(0x00, *_DC_LUM))
    out += _marker(0xC4, _dht_body(0x10, *_AC_LUM))
    if channels == 3:
        out += _marker(0xC4, _dht_body(0x01, *_DC_CHR))
        out += _marker(0xC4, _dht_body(0x11, *_AC_CHR))
    sos = bytes([channels]) + b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(channels)
    ) + bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_l, ac_l = _build_codes(*_DC_LUM), _build_codes(*_AC_LUM)
    dc_c, ac_c = _build_codes(*_DC_CHR), _build_codes(*_AC_CHR)
    writer = _BitWriter()
    # 4:4:4 interleaved scan: one 8x8 block per component per MCU
    padded = []
    for ci, plane in enumerate(planes):
        p = np.full((ph, pw), 0.0)
        p[:height, :width] = plane
        p[height:, :width] = plane[-1:, :]  # replicate edges
        p[:, width:] = p[:, width - 1:width]
        padded.append(p - 128.0)
    preds = [0] * channels
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(channels):
                q = ql if ci == 0 else qc
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                preds[ci] = _encode_component(
                    writer, padded[ci][by:by + 8, bx:bx + 8],
                    q, dc, ac, preds[ci],
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG (entropy stream cut)")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG (dangling 0xFF)")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt == 0xD9:  # EOI reached while more bits were needed
                raise ValueError("truncated JPEG (EOI inside scan)")
            else:
                raise ValueError(
                    f"unsupported marker 0xFF{nxt:02X} inside scan "
                    "(restart intervals not supported)"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_code(self, lut) -> int:
        """Decode one Huffman symbol via (code,length)->symbol map."""
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = lut.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG into (width, height, channels, raw pixel
    bytes) — gray (1) or RGB (3). Supports the baseline sequential
    4:4:4 subset this module encodes plus any standards-conformant
    stream within it; progressive scans, subsampled chroma, 12-bit
    depth, arithmetic coding and restart intervals raise ValueError
    (callers dead-letter the row, the PNG-decoder contract)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict = {}
    huff: dict = {}
    width = height = None
    comps: list = []
    scan_comps: list = []
    scan_start = None
    while scan_start is None:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (partial marker header)")
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        tag = data[pos + 1]
        if tag in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{tag:02X} "
                             "(baseline sequential only)")
        if tag == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if pos + 2 + length > len(data):
            raise ValueError("truncated JPEG (marker segment cut)")
        body = data[pos + 4:pos + 2 + length]
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                zz_q = np.frombuffer(
                    body[i + 1:i + 65], np.uint8
                ).astype(np.int32)
                nat = np.empty(64, np.int32)
                nat[ZIGZAG] = zz_q  # zigzag wire order -> natural
                qt[tq] = nat
                i += 65
        elif tag == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                values = list(body[i + 17:i + 17 + n])
                if len(values) != n:
                    raise ValueError("truncated DHT")
                codes = _build_codes(bits, values)
                huff[tc_th] = {
                    (c, ln): sym for sym, (c, ln) in codes.items()
                }
                i += 17 + n
        elif tag == 0xC0:  # SOF0
            depth, height, width, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise ValueError("only 8-bit depth supported")
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            for ci in range(nc):
                cid, sampling, tq = body[6 + 3 * ci:9 + 3 * ci]
                if sampling != 0x11:
                    raise ValueError(
                        "subsampled chroma not supported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif tag == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                raise ValueError("scan component count != frame")
            for si in range(ns):
                cid, tables = body[1 + 2 * si:3 + 2 * si]
                scan_comps.append((cid, tables >> 4, tables & 0xF))
            scan_start = pos + 2 + length
        elif tag == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        pos += 2 + length
    if width is None:
        raise ValueError("missing SOF0 before SOS")

    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    nblocks = (ph // 8) * (pw // 8)
    planes = [np.zeros((ph, pw)) for _ in comps]
    reader = _BitReader(data, scan_start)
    preds = [0] * len(comps)
    qms = []
    for (cid, tq) in comps:
        if tq not in qt:
            raise ValueError(f"missing quant table {tq}")
        qms.append(qt[tq].reshape(8, 8).astype(np.float64))
    luts = []
    for (cid, td, ta) in scan_comps:
        if td not in huff or (0x10 | ta) not in huff:
            raise ValueError("missing Huffman table for scan")
        luts.append((huff[td], huff[0x10 | ta]))
    for b in range(nblocks):
        by = (b // (pw // 8)) * 8
        bx = (b % (pw // 8)) * 8
        for ci in range(len(comps)):
            dc_lut, ac_lut = luts[ci]
            zz = np.zeros(64, np.int64)
            s = reader.read_code(dc_lut)
            diff = _extend(reader.read(s), s) if s else 0
            preds[ci] += diff
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                rs = reader.read_code(ac_lut)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(reader.read(size), size)
                k += 1
            coef = np.zeros(64, np.float64)
            coef[ZIGZAG] = zz
            f = coef.reshape(8, 8) * qms[ci]
            planes[ci][by:by + 8, bx:bx + 8] = _M.T @ f @ _M
    px = np.stack([p[:height, :width] + 128.0 for p in planes], axis=-1)
    if len(comps) == 3:
        px = _ycbcr_to_rgb(px)
    out = np.clip(np.floor(px + 0.5), 0, 255).astype(np.uint8)
    return width, height, len(comps), out.tobytes()


def synth_tile_pixels(doc_id: int, tiles: int = 4) -> bytes:
    """Deterministic grayscale test image of ``tiles`` x ``tiles``
    CONSTANT 8x8 tiles: tile (ty, tx) has value
    (doc_id*31 + ty*tiles + tx*7) % 256. Tile-constant content makes
    the quality-100 JPEG round trip EXACT (see module docstring), and
    the formula is SQL-expressible — what lets the l77 registry query
    round-trip REAL encode->decode and still be DuckDB-oracle-checkable
    (the png.py synth_pixels discipline)."""
    side = tiles * 8
    out = bytearray(side * side)
    for ty in range(tiles):
        for tx in range(tiles):
            v = (doc_id * 31 + ty * tiles + tx * 7) % 256
            for y in range(ty * 8, ty * 8 + 8):
                base = y * side + tx * 8
                for x in range(8):
                    out[base + x] = v
    return bytes(out)
