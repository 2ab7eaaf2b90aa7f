"""Round-12 additions: audio energy vectors (the ANN-ready audio
embedding stand-in) and the second-stage reranker contract."""

from __future__ import annotations

import numpy as np

from mapreducewordoccurences_spark.multimodal.media import (
    _window_energies,
    fake_audio_bytes,
)


def test_window_energies_shape_and_gain_scaling():
    e = _window_energies(fake_audio_bytes(7), n_windows=64)
    assert e is not None and e.shape == (64,) and (e > 0).all()
    # corrupt bytes take the NULL path
    assert _window_energies(b"RIFFgarbage", 64) is None
    assert _window_energies(None, 64) is None


def test_normalized_energy_vector_is_gain_invariant():
    """A gain-scaled clip must normalize to (numerically) the same
    vector — the property the audio IVF row's planted dups rely on."""
    import io
    import wave

    def wav(amDuring: int) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            rng = np.random.RandomState(5)
            amps = rng.randint(50, 1000, 64)
            frames = np.repeat(amps * amDuring, 8).astype("<i2")
            frames[::2] *= -1
            w.writeframes(frames.tobytes())
        return buf.getvalue()

    a = _window_energies(wav(1), 64).astype(np.float64)
    b = _window_energies(wav(3), 64).astype(np.float64)
    na, nb = a / np.linalg.norm(a), b / np.linalg.norm(b)
    cos = float(na @ nb)
    assert cos > 1 - 1e-12
