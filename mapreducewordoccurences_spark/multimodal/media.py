"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata — the
standard Spark shape for multimodal training data (payloads stay
byte-for-byte, metadata is columnar and prunable). Heavy per-item work
(decode, feature extraction, frame sampling) runs in Arrow-batched
``mapInPandas`` / ``pandas_udf`` so Python touches data once per
batch, not once per row, and each task streams batches — no executor
needs a whole partition of media in memory at once.

Codec note: every operator first tries the engine's self-describing
test header (``fake_image_bytes`` — deterministic, closed-form
oracles), then falls back to a REAL decoder behind a try-import of
Pillow (``_try_import_pil``). With Pillow installed, real
PNG/JPEG/GIF payloads decode, featurize, resize, and frame-sample
through the exact same Arrow-batched plumbing; without it (this
sandbox), real payloads yield NULL dims/features — the same graceful
path corrupt bytes take, so jobs never fail on codec availability.
The Spark-side contract — schemas, batch iteration, partitioning,
UDF signatures — is identical either way and tested in both modes.
Video (ffmpeg) remains header-driven: frame COUNTS fan out rows;
attaching real frame bytes would slot into the same iterator.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (id, kind, payload, meta) — the engine's canonical media row
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

_MAGIC = b"FAKEIMG1"
_HEADER = struct.Struct("<8sHHBB")  # magic, width, height, channels, n_frames


def fake_image_bytes(width: int, height: int, channels: int = 3, n_frames: int = 1) -> bytes:
    """Deterministic stand-in for an encoded image/clip: a parseable
    header + a payload whose bytes are a simple position function."""
    header = _HEADER.pack(_MAGIC, width, height, channels, n_frames)
    body = bytes(
        (x * 31 + 7) % 256 for x in range(min(width * height * channels, 4096))
    )
    return header + body


def _parse_header(payload: bytes | None) -> tuple[int, int, int, int] | None:
    if payload is None or len(payload) < _HEADER.size:
        return None
    magic, w, h, c, f = _HEADER.unpack_from(payload)
    if magic != _MAGIC:
        return None
    return w, h, c, f


def _try_import_pil():
    """Pillow, or None. Evaluated lazily inside worker batches so the
    real-codec path lights up wherever the executor image has Pillow,
    with zero hard dependency."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    return Image


def _real_image_meta(payload: bytes | None) -> tuple[int, int, int, int] | None:
    """(width, height, channels, n_frames) via Pillow, or None when
    Pillow is absent or the bytes don't decode."""
    image_mod = _try_import_pil()
    if image_mod is None or payload is None:
        return None
    import io  # noqa: PLC0415

    try:
        with image_mod.open(io.BytesIO(payload)) as img:
            w, h = img.size
            return w, h, len(img.getbands()), int(getattr(img, "n_frames", 1))
    except Exception:  # noqa: BLE001 — corrupt bytes take the NULL path
        return None


def _any_image_meta(payload: bytes | None) -> tuple[int, int, int, int] | None:
    """Fake-header first (cheap constant-time parse), then real codec."""
    return _parse_header(payload) or _real_image_meta(payload)


def make_fake_media(df: DataFrame, id_col: str = "doc_id", kind: str = "image") -> DataFrame:
    """Deterministic MEDIA_SCHEMA corpus derived from an id column.

    The testdata has no binary media, so payloads are generated as a
    pure function of the id — which means an oracle can predict every
    decoded dimension arithmetically, WITHOUT parsing payloads:

        width    = 16 + id % 48
        height   = 16 + (id * 7) % 40
        channels = 1 + id % 3
        n_frames = 1 + id % 5

    The encode runs in Arrow-batched mapInPandas exactly like a real
    media ingest would; the catalog queries (media_image_dims,
    media_frame_sample) round-trip encode → decode and check the
    result against the closed-form oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                fake_image_bytes(
                    16 + int(i) % 48, 16 + (int(i) * 7) % 40, 1 + int(i) % 3, 1 + int(i) % 5
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": payloads,
                    "meta": [
                        {"source": "synthetic", "mime": f"{kind}/fake", "bytes": len(p)}
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """payload → (media_id, width, height, channels, n_frames) via
    Arrow-batched mapInPandas. Test-header payloads parse in constant
    time; anything else goes through Pillow when installed (PNG/JPEG/
    GIF, n_frames for animated formats). Undecodable payloads yield
    NULL dims (never fail the job — at 100 TB some corruption is
    guaranteed)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_any_image_meta(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": pd.array([m[0] if m else None for m in metas], dtype="Int32"),
                    "height": pd.array([m[1] if m else None for m in metas], dtype="Int32"),
                    "channels": pd.array([m[2] if m else None for m in metas], dtype="Int32"),
                    "n_frames": pd.array([m[3] if m else None for m in metas], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)


def extract_image_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """payload → fixed-dim float feature vector (array<float>).

    Deterministic byte-histogram projection (a stand-in for a vision
    encoder) so downstream similarity/dedup operators
    (functions/similarity.py) have real inputs to chew on. Test-header
    payloads featurize over the fake body; real images featurize over
    Pillow-DECODED pixel bytes when Pillow is installed (codec
    framing stripped — the histogram sees pixels, not compression
    artifacts). The batch shape — Arrow in, array<float> out — is
    exactly what a model-backed UDF uses.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    # plain int — closures ship via cloudpickle and struct.Struct
    # objects don't pickle
    hdr_size = _HEADER.size

    def _featurizable_bytes(p):
        if p is None:
            return None
        if _parse_header(p) is not None:
            return p[hdr_size:]
        image_mod = _try_import_pil()
        if image_mod is None:
            return None
        import io  # noqa: PLC0415

        try:
            with image_mod.open(io.BytesIO(p)) as img:
                return img.tobytes()
        except Exception:  # noqa: BLE001
            return None

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                # undecodable payloads yield NULL features, matching
                # decode_image_meta (don't featurize garbage bytes)
                body = _featurizable_bytes(p)
                if body is None:
                    feats.append(None)
                    continue
                hist = [0.0] * dim
                for i, byte in enumerate(body[:2048]):
                    hist[byte % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(featurize, out_schema)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """payload → payload re-encoded at (target_width, target_height).

    Test-header payloads take the stub resample (header dims rewritten,
    fake body nearest-neighbor-sampled so output size tracks the
    target); real images decode → resize → re-encode in their original
    format through Pillow when installed, NULL otherwise. The
    Spark-side contract is identical on every path: binary in / binary
    out, Arrow-batched, constant memory per batch — resized payloads
    REPLACE originals in the same column so downstream stages are
    layout-agnostic.
    """
    if not (0 < target_width <= 0xFFFF and 0 < target_height <= 0xFFFF):
        raise ValueError(
            f"target dims must be in 1..65535 (header fields are uint16), "
            f"got {target_width}x{target_height}"
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    hdr_size = _HEADER.size

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        header = _struct.Struct("<8sHHBB")  # Struct objects don't pickle
        def real_resize(p):
            image_mod = _try_import_pil()
            if image_mod is None:
                return None
            import io  # noqa: PLC0415

            try:
                with image_mod.open(io.BytesIO(p)) as img:
                    fmt = img.format
                    buf = io.BytesIO()
                    img.resize((target_width, target_height)).save(buf, format=fmt)
                    return buf.getvalue()
            except Exception:  # noqa: BLE001
                return None

        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p in pdf[payload_col]:
                hdr = _parse_header(p)
                if hdr is None:
                    resized = real_resize(p) if p is not None else None
                    payloads.append(resized)
                    widths.append(target_width if resized is not None else None)
                    heights.append(target_height if resized is not None else None)
                    continue
                w, h, c, f = hdr
                body = p[hdr_size:]
                n_out = min(target_width * target_height * c, 4096)
                n_in = len(body)
                # nearest-neighbor over the stub body
                out_body = (
                    bytes(body[(i * n_in) // n_out] for i in range(n_out))
                    if n_in and n_out
                    else b""
                )
                payloads.append(
                    header.pack(_MAGIC, target_width, target_height, c, f) + out_body
                )
                widths.append(target_width)
                heights.append(target_height)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: payloads,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)


def sample_frames(
    df: DataFrame,
    every_nth: int = 2,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video-style frame sampling: one output row per kept frame index
    (media_id, frame_idx). Frame COUNTS come from the test header, or
    from Pillow's n_frames for real animated formats (GIF/APNG) when
    installed. Real decoders would additionally attach the frame
    bytes (ffmpeg for video — absent here); attaching them is one
    more column in this same iterator, the row-multiplicity plumbing
    is the part that matters to the plan.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                hdr = _any_image_meta(p)
                if hdr is None:
                    continue
                for frame in range(0, hdr[3], every_nth):
                    ids.append(mid)
                    idxs.append(frame)
            yield pd.DataFrame(
                {"media_id": pd.array(ids, dtype="int64"), "frame_idx": pd.array(idxs, dtype="int32")}
            )

    return df.select(id_col, payload_col).mapInPandas(sample, out_schema)


# ---------------------------------------------------------------------------
# Audio: a REAL codec path with zero optional deps — RIFF/WAVE PCM via
# the stdlib ``wave`` module. Unlike images (Pillow optional), audio
# decode is always-real in any Python: make_fake_audio writes genuine
# WAV containers and decode_audio_meta parses them back through the
# codec, end to end, in the same Arrow-batched mapInPandas shape.
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),  # frames/channel
        T.StructField("rms", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def _audio_params(media_id: int) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, n_samples, amplitude) as closed-form
    functions of the id, so catalog oracles can predict every decoded
    field arithmetically. The waveform is a square wave at amplitude
    A, whose RMS and peak are EXACTLY A — float-free oracle math."""
    i = int(media_id)
    return (
        8000 * (1 + i % 3),
        1 + i % 2,
        64 + (i * 13) % 400,
        500 + (i % 100) * 7,
    )


def fake_audio_bytes(media_id: int) -> bytes:
    """A genuine RIFF/WAVE PCM16 payload (stdlib ``wave`` encoder):
    square wave with period 16 frames at the id-derived amplitude."""
    import io  # noqa: PLC0415
    import wave  # noqa: PLC0415

    rate, channels, n_samples, amp = _audio_params(media_id)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for s in range(n_samples):
            val = amp if (s // 8) % 2 == 0 else -amp
            frames += struct.pack("<h", val) * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def make_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MEDIA_SCHEMA audio corpus: real WAV payloads as a
    pure function of the id (see _audio_params)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [fake_audio_bytes(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "payload": payloads,
                    "meta": [
                        {"source": "synthetic", "mime": "audio/wav", "bytes": len(p)}
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, MEDIA_SCHEMA)


def decode_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """payload → (media_id, sample_rate, n_channels, n_samples, rms,
    peak) through the REAL stdlib WAV codec. rms/peak are integer
    (exact for PCM16: sum of squares stays well inside int64/float64
    exact range per clip; rms rounds half-up the same on every
    platform because the generator's square waves make it integral).
    Corrupt or non-WAV bytes take the NULL path, like images."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io  # noqa: PLC0415
        import wave  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        def one(payload):
            if payload is None:
                return (None, None, None, None, None)
            try:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    ch = w.getnchannels()
                    nf = w.getnframes()
                    if w.getsampwidth() != 2:
                        return (rate, ch, nf, None, None)
                    x = np.frombuffer(w.readframes(nf), dtype="<i2").astype(
                        np.int64
                    )
                if x.size == 0:
                    return (rate, ch, nf, 0, 0)
                rms = int(round(float(np.sqrt(np.mean((x * x).astype(np.float64))))))
                return (rate, ch, nf, rms, int(np.max(np.abs(x))))
            except Exception:  # noqa: BLE001 — corrupt bytes → NULL path
                return (None, None, None, None, None)

        for pdf in batches:
            metas = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.array([m[0] for m in metas], dtype="Int32"),
                    "n_channels": pd.array([m[1] for m in metas], dtype="Int32"),
                    "n_samples": pd.array([m[2] for m in metas], dtype="Int64"),
                    "rms": pd.array([m[3] for m in metas], dtype="Int64"),
                    "peak": pd.array([m[4] for m in metas], dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, AUDIO_META_SCHEMA)
