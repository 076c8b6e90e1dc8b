"""Multimodal columns: binary payloads + typed metadata, decoded and
featurized inside Arrow-batched ``mapInPandas``.

Image/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. Decode is REAL for the container formats the Python
stdlib + numpy can parse — PPM/PGM images (P2/P3/P5/P6) and PCM WAV
audio — and STUBBED only at the true codec boundary (JPEG/PNG/MP3/MP4
need PIL/ffmpeg, which are not in this image): ``decode_stub=True``
substitutes a deterministic payload-hash feature for codec formats so
the distributed plumbing can run end-to-end; ``decode_stub=False``
raises NotImplementedError there. Corrupt payloads of a KNOWN format
yield a NULL feature (quarantine-friendly) instead of failing the task.

Feature spec (deterministic, 16-dim float32):
  image: 4x4 block-mean luminance grid, [0, 1]
  audio: [rms, zero-crossing-rate, 14 spectral band energies (|rFFT|
         band means, L1-normalized)]
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, codec string, feature array<float>, n_bytes int"
)

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# real decoders (stdlib + numpy only)
# ---------------------------------------------------------------------------

def sniff_codec(payload: bytes | None) -> str:
    """Magic-byte container sniffing (never trust the metadata mime)."""
    if not payload:
        return "empty"
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return "pnm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_pnm(payload: bytes) -> tuple[np.ndarray, int]:
    """PPM/PGM → ((h, w, channels) uint8 array, maxval). 8-bit formats
    only (maxval ≤ 255 — 16-bit is rejected, not mis-decoded). Raises
    ValueError on a malformed payload (caller quarantines)."""
    tokens: list[bytes] = []
    pos = 0
    # header: magic, width, height, maxval (comments allowed)
    while len(tokens) < 4 and pos < len(payload):
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            break
        tokens.append(payload[start:pos])
    if len(tokens) < 4:
        raise ValueError("truncated PNM header")
    magic = tokens[0]
    try:
        w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    except ValueError as exc:
        raise ValueError("non-numeric PNM header") from exc
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError("bad PNM dimensions")
    if maxval > 255:
        # 16-bit PNM is 2 bytes/sample — decoding it as uint8 would
        # produce confidently-wrong features; reject → quarantine
        raise ValueError("16-bit PNM (maxval > 255) not supported")
    channels = 3 if magic in (b"P3", b"P6") else 1
    n_vals = w * h * channels
    if magic in (b"P5", b"P6"):
        # exactly ONE whitespace byte separates maxval from pixel data,
        # but Windows-written PNM uses b"\r\n" — treat that pair as one
        # separator, otherwise pixel data shifts by a byte and (the
        # payload still being long enough) decodes to confidently-wrong
        # features instead of quarantining
        sep = 2 if payload[pos : pos + 2] == b"\r\n" else 1
        body = payload[pos + sep : pos + sep + n_vals]
        if len(body) < n_vals:
            raise ValueError("truncated PNM body")
        arr = np.frombuffer(body, dtype=np.uint8, count=n_vals)
    elif magic in (b"P2", b"P3"):
        vals = payload[pos:].split()
        if len(vals) < n_vals:
            raise ValueError("truncated ASCII PNM body")
        arr64 = np.array(vals[:n_vals], dtype=np.int64)
        if arr64.min() < 0 or arr64.max() > maxval:
            raise ValueError("ASCII PNM sample out of range")
        arr = arr64.astype(np.uint8)
    else:
        raise ValueError(f"unsupported PNM magic {magic!r}")
    return arr.reshape(h, w, channels), maxval


def image_features(img: np.ndarray, grid: int = 4, maxval: int = 255) -> list[float]:
    """4x4 block-mean luminance grid in [0, 1] — a deterministic
    'thumbnail embedding' (the resize/downsample op of an image
    pipeline, done as pure numpy block means). Normalized by the
    image's own maxval so a maxval=15 PGM still lands in [0, 1]."""
    lum = img.astype(np.float64).mean(axis=2)  # luminance = channel mean
    h, w = lum.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros((grid, grid))
    for i in range(grid):
        for j in range(grid):
            block = lum[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean() if block.size else 0.0
    return (out / float(maxval)).astype(np.float32).ravel().tolist()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload)) as wf:
        n, width, rate, ch = (
            wf.getnframes(), wf.getsampwidth(), wf.getframerate(), wf.getnchannels(),
        )
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return samples, rate


def audio_features(samples: np.ndarray, n_bands: int = FEATURE_DIM - 2) -> list[float]:
    """[rms, zero-crossing rate, n_bands L1-normalized |rFFT| band means]."""
    if len(samples) == 0:
        return [0.0] * (n_bands + 2)
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(samples))
    bands = np.array_split(spec, n_bands)
    energy = np.array([b.mean() if b.size else 0.0 for b in bands])
    total = energy.sum()
    if total > 0:
        energy = energy / total
    return [np.float32(rms), np.float32(zcr), *energy.astype(np.float32).tolist()]


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for codec formats under decode_stub=True:
    dim floats derived from the payload digest (NOT a real feature)."""
    if payload is None:
        return [0.0] * dim
    d = hashlib.sha256(payload).digest()
    arr = np.frombuffer((d * ((dim * 4) // len(d) + 1))[: dim * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32).tolist()


def _featurize_one(payload: bytes | None, decode_stub: bool) -> tuple[str, list | None]:
    codec = sniff_codec(payload)
    try:
        if codec == "pnm":
            img, maxval = decode_pnm(payload)
            return codec, image_features(img, maxval=maxval)
        if codec == "wav":
            samples, _rate = decode_wav(payload)
            return codec, audio_features(samples)
    except (ValueError, wave.Error, EOFError):
        return codec, None  # corrupt known-format payload → quarantine row
    if codec == "empty":
        return codec, [0.0] * FEATURE_DIM
    # codec formats (jpeg/png/mp3/mp4/unknown): the true stub boundary
    if not decode_stub:
        raise NotImplementedError(
            f"decoding {codec} requires PIL/ffmpeg — not in this image"
        )
    return codec, _fake_feature(payload)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas featurizer: media rows → (media_id, codec, feature).

    PNM images and WAV audio are REALLY decoded (stdlib+numpy); codec
    formats hit the stub boundary. Corrupt known-format payloads yield
    feature=NULL so one bad file never kills a 100 TB scan task.
    """

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codecs, feats = [], []
            for p in pdf["payload"]:
                codec, feat = _featurize_one(p, decode_stub)
                codecs.append(codec)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "codec": codecs,
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(body, FEATURE_SCHEMA)


def encode_pnm(img: np.ndarray, maxval: int = 255) -> bytes:
    """(h, w, channels) uint8 → binary PNM payload (P5 for 1 channel,
    P6 for 3) — the stdlib-only inverse of decode_pnm."""
    h, w, channels = img.shape
    magic = b"P6" if channels == 3 else b"P5"
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    return header + img.astype(np.uint8).tobytes()


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy fancy-indexing, no loops):
    the deterministic resize every image pipeline needs before a model
    sees the pixels. Index choice matches the standard (i + 0.5) *
    scale - 0.5 pixel-center convention, clamped to bounds."""
    h, w, _ = img.shape
    ys = np.clip(np.round((np.arange(out_h) + 0.5) * (h / out_h) - 0.5), 0, h - 1)
    xs = np.clip(np.round((np.arange(out_w) + 0.5) * (w / out_w) - 0.5), 0, w - 1)
    return img[ys.astype(int)][:, xs.astype(int)]


def resize_images(
    df: DataFrame, out_w: int, out_h: int, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas resize pass: image rows → (media_id, codec, payload)
    where payload is the re-encoded PNM at (out_w, out_h).

    PNM payloads are REALLY decoded, resampled (nearest-neighbor), and
    re-encoded with the stdlib-only codec above; JPEG/PNG hit the same
    stub boundary as extract_features (decode_stub=True emits a NULL
    payload with the codec labeled so a downstream writer can route
    them to the codec-capable cluster; decode_stub=False raises).
    Corrupt known-format payloads yield NULL (quarantine row), never a
    task failure."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"resize target must be positive, got {out_w}x{out_h}")
    schema = (
        "media_id string, codec string, payload binary, "
        "out_w int, out_h int"
    )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codecs, payloads = [], []
            for p in pdf["payload"]:
                codec = sniff_codec(p)
                out: bytes | None = None
                if codec == "pnm":
                    try:
                        img, maxval = decode_pnm(p)
                        out = encode_pnm(resize_image(img, out_w, out_h), maxval)
                    except ValueError:
                        out = None  # corrupt → quarantine
                elif codec not in ("empty",):
                    if not decode_stub:
                        raise NotImplementedError(
                            f"decoding {codec} requires PIL/ffmpeg — not in this image"
                        )
                codecs.append(codec)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": codecs,
                    "payload": payloads,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return df.filter(df.kind == "image").mapInPandas(body, schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling plumbing for video rows: 1 row → N frame rows
    (flatMap shape). Video containers need ffmpeg, so frame decode is
    stubbed; the row expansion, schema, and timestamps are real."""
    schema = "media_id string, frame_idx int, frame_ts_ms int, frame_feature array<float>"

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode requires ffmpeg")
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                duration = (meta or {}).get("duration_ms") or 0
                n = max(duration // every_ms, 1)
                for i in range(int(n)):
                    seed = (mid + f"#{i}").encode()
                    rows.append(
                        (mid, i, i * every_ms, _fake_feature(seed, dim=8))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_feature"],
            )

    return df.filter(df.kind == "video").mapInPandas(body, schema)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono float64 samples in [-1, 1] → 16-bit PCM WAV bytes (stdlib
    ``wave`` — the inverse codec to decode_wav, same role encode_pnm
    plays for images)."""
    clipped = np.clip(samples, -1.0, 1.0)
    pcm = np.round(clipped * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(int(rate))
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resample_audio_samples(
    samples: np.ndarray, in_rate: int, out_rate: int
) -> np.ndarray:
    """Linear-interpolation resample (numpy) — deterministic; output
    grid is t_k = k / out_rate over the input duration."""
    if len(samples) == 0 or in_rate == out_rate:
        return samples
    duration = len(samples) / float(in_rate)
    n_out = max(int(round(duration * out_rate)), 1)
    t_out = np.arange(n_out) / float(out_rate)
    t_in = np.arange(len(samples)) / float(in_rate)
    return np.interp(t_out, t_in, samples)


def resample_audio(
    df: DataFrame, out_rate: int, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas resample pass: audio rows → (media_id, codec,
    payload, out_rate, n_samples) with payload the re-encoded 16-bit
    PCM WAV at ``out_rate`` — the audio analog of resize_images, and
    like it REAL end-to-end for the stdlib-decodable format (WAV
    decode → linear-interp resample → WAV re-encode, no external
    codec). MP3/MP4 hit the same stub boundary as extract_features
    (NULL payload with the codec labeled; decode_stub=False raises).
    Corrupt WAV payloads yield NULL (quarantine), never task death."""
    if out_rate <= 0:
        raise ValueError(f"target sample rate must be positive, got {out_rate}")
    schema = (
        "media_id string, codec string, payload binary, "
        "out_rate int, n_samples long"
    )

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codecs, payloads, counts = [], [], []
            for p in pdf["payload"]:
                codec = sniff_codec(p)
                out: bytes | None = None
                n_out = 0
                if codec == "wav":
                    try:
                        samples, rate = decode_wav(p)
                        res = resample_audio_samples(samples, rate, out_rate)
                        out = encode_wav(res, out_rate)
                        n_out = len(res)
                    except (ValueError, EOFError, wave.Error):
                        out = None  # corrupt → quarantine
                elif codec not in ("empty",):
                    if not decode_stub:
                        raise NotImplementedError(
                            f"decoding {codec} requires ffmpeg — not in this image"
                        )
                codecs.append(codec)
                payloads.append(out)
                counts.append(n_out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "codec": codecs,
                    "payload": payloads,
                    "out_rate": out_rate,
                    "n_samples": counts,
                }
            )

    return df.filter(df.kind == "audio").mapInPandas(body, schema)
