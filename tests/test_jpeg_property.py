"""Property tests for the vendored JPEG codec (multimodal/jpeg.py):
randomized dims/channels/quality round-trips, and decoder robustness
under byte mutation (the 100 TB corruption rule: ANY bytes must yield
pixels or None, never an exception — a single raise inside
mapInPandas fails a whole task). Bounded example counts keep the
suite's runtime flat."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreducewordoccurences_spark.multimodal.jpeg import (
    jpeg_encode,
    jpeg_meta,
    jpeg_pixels,
)

dims = st.tuples(st.integers(1, 70), st.integers(1, 70))


@settings(max_examples=25, deadline=None)
@given(
    wh=dims,
    quality=st.integers(35, 98),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_roundtrip_properties(wh, quality, seed):
    w, h = wh
    rng = np.random.RandomState(seed)
    # smooth-ish content (noise at low quality has unbounded error)
    base = rng.randint(40, 216)
    img = np.clip(
        base
        + 30 * np.cos(2 * np.pi * np.arange(w) / max(w, 2))[None, :]
        + 30 * np.cos(2 * np.pi * np.arange(h) / max(h, 2))[:, None],
        0,
        255,
    ).astype(np.uint8)
    p = jpeg_encode(w, h, 1, img.tobytes(), quality=quality)
    assert jpeg_meta(p) == (w, h, 1, 1)
    px = jpeg_pixels(p)
    assert px is not None and len(px) == w * h
    dec = np.frombuffer(px, np.uint8).reshape(h, w).astype(int)
    # bounded error on smooth content at any quality in range
    assert np.abs(dec - img.astype(int)).mean() < 20


@settings(max_examples=20, deadline=None)
@given(
    wh=dims,
    subsample=st.booleans(),
    restart=st.sampled_from([0, 1, 3, 7]),
    seed=st.integers(0, 2**31 - 1),
)
def test_color_roundtrip_never_fails(wh, subsample, restart, seed):
    w, h = wh
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    p = jpeg_encode(
        w, h, 3, rgb.tobytes(), quality=90,
        subsample=subsample, restart_interval=restart,
    )
    assert jpeg_meta(p) == (w, h, 3, 1)
    px = jpeg_pixels(p)
    assert px is not None and len(px) == w * h * 3


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_mut=st.integers(1, 12),
)
def test_decoder_never_raises_on_mutated_bytes(seed, n_mut):
    """Flip random bytes anywhere in a valid stream (markers, tables,
    entropy data): decode must return bytes or None, never raise."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    p = bytearray(jpeg_encode(24, 24, 1, img.tobytes(), quality=80))
    for _ in range(n_mut):
        p[rng.randint(0, len(p))] = rng.randint(0, 256)
    out = jpeg_pixels(bytes(p))
    assert out is None or isinstance(out, bytes)
    meta = jpeg_meta(bytes(p))
    assert meta is None or len(meta) == 4


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_decoder_never_raises_on_arbitrary_bytes(data):
    assert jpeg_pixels(data) is None or isinstance(jpeg_pixels(data), bytes)
    m = jpeg_meta(data)
    assert m is None or len(m) == 4


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_decoder_never_raises_on_jpeg_prefixed_bytes(data):
    payload = b"\xff\xd8" + data
    assert jpeg_pixels(payload) is None or isinstance(
        jpeg_pixels(payload), bytes
    )
