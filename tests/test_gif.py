"""Vendored GIF87a/89a codec (multimodal/gif.py, r11) — LZW
round-trips, interlace invariance, multi-frame compositing, graceful
failure paths, and cross-implementation validation against the JVM's
javax.imageio (lossless format, so both directions compare EXACT)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapreducewordoccurences_spark.multimodal.gif import (
    gif_encode,
    gif_meta,
    gif_pixels,
)
from mapreducewordoccurences_spark.multimodal.media import (
    _any_image_meta,
    _any_image_pixels,
    _png_meta,
    _png_pixels,
    png_encode,
)


def _gradient(w: int, h: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return ((xx * 3 + yy * 5) % 200 + 20).astype(np.uint8)


# ---------------------------------------------------------------------------
# pure-Python round-trips (no Spark)
# ---------------------------------------------------------------------------


def test_gray_roundtrip_exact():
    """GIF is lossless: gray-palette round-trips must be bit-exact,
    across odd dims and the LZW code-width ladder."""
    for w, h in [(1, 1), (8, 8), (37, 29), (33, 31), (64, 3), (200, 150)]:
        img = _gradient(w, h)
        g = gif_encode(w, h, [img.tobytes()])
        assert gif_meta(g) == (w, h, 3, 1)
        px = np.frombuffer(gif_pixels(g), np.uint8).reshape(h, w, 3)
        assert (px[:, :, 0] == img).all()
        assert (px[:, :, 1] == img).all() and (px[:, :, 2] == img).all()


def test_interlace_is_byte_distinct_pixel_identical():
    """The planted-corpus invariance: an interlaced re-encode is a
    different LZW stream that decodes to identical pixels."""
    for w, h in [(37, 29), (16, 16), (9, 17)]:
        img = np.random.RandomState(w * h).randint(0, 256, w * h)
        img = img.astype(np.uint8).tobytes()
        a = gif_encode(w, h, [img])
        b = gif_encode(w, h, [img], interlace=True)
        assert a != b
        assert gif_pixels(a) == gif_pixels(b)


def test_multiframe_meta_and_compositing():
    base = _gradient(20, 15).tobytes()
    shifted = (np.frombuffer(base, np.uint8) + 5).astype(np.uint8).tobytes()
    g = gif_encode(20, 15, [base, shifted, base])
    assert gif_meta(g) == (20, 15, 3, 3)
    px = gif_pixels(g)
    assert len(px) == 3 * 20 * 15 * 3
    f0, f1, f2 = px[:900], px[900:1800], px[1800:]
    assert f0 != f1 and f0 == f2


def test_lzw_table_full_path():
    """Noise at 400x300 forces the dictionary to 4096 entries — the
    deferred-clear stall both coder and decoder must agree on."""
    img = np.random.RandomState(1).randint(0, 256, (300, 400))
    img = img.astype(np.uint8)
    g = gif_encode(400, 300, [img.tobytes()])
    px = np.frombuffer(gif_pixels(g), np.uint8).reshape(300, 400, 3)
    assert (px[:, :, 0] == img).all()


def test_corrupt_and_foreign_bytes_return_none():
    assert gif_meta(None) is None
    assert gif_meta(b"") is None
    assert gif_meta(b"notagif" * 4) is None
    assert gif_pixels(b"GIF89a" + b"\x00" * 20) is None
    g = gif_encode(16, 16, [_gradient(16, 16).tobytes()])
    assert gif_pixels(g[:20]) is None  # truncated mid-headers
    out = gif_pixels(g[: len(g) // 2])
    assert out is None or isinstance(out, bytes)
    # PNG bytes are not a GIF
    assert gif_meta(png_encode(8, 8, 1, 1, frames=[bytes(64)])) is None


def test_decode_work_bounded_by_header_caps():
    """Same untrusted-corpus contract as the JPEG codec: absurd
    claimed dims are rejected from the header, fast."""
    import time

    g = bytearray(gif_encode(16, 16, [_gradient(16, 16).tobytes()]))
    struct.pack_into("<HH", g, 6, 65535, 65535)
    t0 = time.time()
    assert gif_pixels(bytes(g)) is None
    assert time.time() - t0 < 1.0


def test_any_image_dispatch_claims_gif():
    """The media tier's codec chain must route GIF payloads through
    the vendored codec — the r10 NULL-features gap, closed."""
    img = _gradient(24, 18)
    g = gif_encode(24, 18, [img.tobytes()])
    assert _any_image_meta(g) == (24, 18, 3, 1)
    decoded = _any_image_pixels(g)
    assert decoded is not None
    (w, h, ch, nf), px = decoded
    assert (w, h, ch, nf) == (24, 18, 3, 1)
    arr = np.frombuffer(px, np.uint8).reshape(h, w, ch)
    assert (arr[:, :, 0] == img).all()


# ---------------------------------------------------------------------------
# cross-implementation: javax.imageio through the Spark JVM
# ---------------------------------------------------------------------------


@pytest.fixture()
def imageio(spark):
    jvm = spark._jvm

    class Bridge:
        def decode_to_png(self, payload: bytes) -> bytes | None:
            img = jvm.javax.imageio.ImageIO.read(
                jvm.java.io.ByteArrayInputStream(payload)
            )
            if img is None:
                return None
            baos = jvm.java.io.ByteArrayOutputStream()
            if not jvm.javax.imageio.ImageIO.write(img, "png", baos):
                return None
            return bytes(baos.toByteArray())

        def png_to_gif(self, png: bytes) -> bytes | None:
            img = jvm.javax.imageio.ImageIO.read(
                jvm.java.io.ByteArrayInputStream(png)
            )
            if img is None:
                return None
            baos = jvm.java.io.ByteArrayOutputStream()
            if not jvm.javax.imageio.ImageIO.write(img, "gif", baos):
                return None
            return bytes(baos.toByteArray())

    return Bridge()


def test_imageio_decodes_our_gif_bitexact(imageio):
    for w, h in [(37, 29), (16, 16), (64, 40)]:
        img = _gradient(w, h)
        g = gif_encode(w, h, [img.tobytes()])
        png = imageio.decode_to_png(g)
        assert png is not None, "ImageIO rejected our GIF stream"
        pw, ph, pch, _ = _png_meta(png)
        assert (pw, ph) == (w, h)
        arr = np.frombuffer(_png_pixels(png), np.uint8).reshape(h, w, pch)
        assert (arr[:, :, 0] == img).all()


def test_our_decoder_reads_imageio_gif_bitexact(imageio):
    """Real-world-encoder coverage: javax.imageio's GIF writer (its
    own palette and LZW packing) must decode bit-exactly through the
    vendored path — lossless, so EXACT equality."""
    for w, h in [(40, 32), (33, 31)]:
        img = _gradient(w, h)
        g = imageio.png_to_gif(
            png_encode(w, h, 1, 1, frames=[img.tobytes()])
        )
        assert g is not None and g[:4] == b"GIF8"
        m = gif_meta(g)
        assert m is not None and (m[0], m[1]) == (w, h)
        px = gif_pixels(g)
        assert px is not None, "vendored decoder rejected an ImageIO GIF"
        arr = np.frombuffer(px[: w * h * 3], np.uint8).reshape(h, w, 3)
        assert (arr[:, :, 0] == img).all()


# ---------------------------------------------------------------------------
# joint work bounds + frame-0 early stop (ADVICE r11)
# ---------------------------------------------------------------------------


def _tiny_frame_gif(w: int, h: int, n_frames: int) -> bytes:
    """Hand-built GIF: a large logical screen with ``n_frames`` 1x1
    image descriptors — the adversarial shape where per-frame caps
    pass individually but accumulated canvas output explodes."""
    from mapreducewordoccurences_spark.multimodal.gif import _lzw_encode

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80, 0, 0])  # GCT present, 2 entries
    out += b"\x00\x00\x00\xff\xff\xff"
    px = _lzw_encode(b"\x01", 2)
    for _ in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
        out += bytes([2, len(px)]) + px + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_accumulated_canvas_output_bounded():
    """512 tiny frames on a 2048x2048 canvas would legally demand
    ~6 GB of accumulated per-frame canvases — the joint bound must
    reject it (per-frame caps alone cannot: each frame is 1 px)."""
    import time

    g = _tiny_frame_gif(2048, 2048, 512)
    t0 = time.time()
    assert gif_pixels(g) is None
    assert time.time() - t0 < 5.0
    # a modest accumulation stays in service
    ok = _tiny_frame_gif(64, 64, 8)
    assert gif_pixels(ok) is not None


def test_lzw_density_bound_rejects_implausible_dims():
    """A full-canvas frame claimed against a few-hundred-byte payload
    exceeds any spec-legal LZW expansion — rejected BEFORE the LZW
    decode, mirroring jpeg._decode_plausible."""
    import time

    from mapreducewordoccurences_spark.multimodal.gif import _lzw_encode

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 4000, 4000)  # inside the per-canvas cap
    out += bytes([0x80, 0, 0])
    out += b"\x00\x00\x00\xff\xff\xff"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4000, 4000) + b"\x00"
    px = _lzw_encode(b"\x01" * 32, 2)
    out += bytes([2, len(px)]) + px + b"\x00\x3b"
    t0 = time.time()
    assert gif_pixels(bytes(out)) is None
    assert time.time() - t0 < 1.0


def test_gif_decode_plausible_unit():
    from mapreducewordoccurences_spark.multimodal.gif import (
        _MAX_PIXELS_PER_PAYLOAD_BYTE,
        _MAX_TOTAL_FRAME_PIXELS,
        _MAX_TOTAL_OUT_BYTES,
        _gif_decode_plausible,
    )

    assert _gif_decode_plausible(1000, 3000, 1000)
    assert not _gif_decode_plausible(_MAX_TOTAL_FRAME_PIXELS + 1, 0, 10**9)
    assert not _gif_decode_plausible(1000, _MAX_TOTAL_OUT_BYTES + 1, 10**9)
    assert not _gif_decode_plausible(
        _MAX_PIXELS_PER_PAYLOAD_BYTE * 100 + 1, 0, 100
    )


def test_max_frames_early_stop_matches_full_decode_prefix():
    """frame-0-only consumers must get byte-identical frame 0 while
    skipping later frames' LZW + composite work."""
    base = _gradient(20, 15).tobytes()
    shifted = (np.frombuffer(base, np.uint8) + 9).astype(np.uint8).tobytes()
    g = gif_encode(20, 15, [base, shifted, base])
    full = gif_pixels(g)
    first = gif_pixels(g, max_frames=1)
    assert len(first) == 20 * 15 * 3
    assert first == full[: 20 * 15 * 3]
    two = gif_pixels(g, max_frames=2)
    assert two == full[: 2 * 20 * 15 * 3]
