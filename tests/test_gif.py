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
