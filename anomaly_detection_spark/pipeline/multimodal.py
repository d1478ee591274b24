"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a struct of
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators.

Decode support is format-honest:

- **real** for uncompressed formats decodable with the stdlib + numpy:
  PCM WAV (``audio/wav``: stdlib ``wave``) and binary PPM
  (``image/x-portable-pixmap``: header parse + ``np.frombuffer``),
  including block-mean resize and deterministic feature kernels;
- **stubbed** for compressed formats (JPEG/PNG/MP3/MP4 …): the codec
  libraries are not in this container, so decode raises
  ``NotImplementedError`` unless ``fake=True``, which substitutes a
  deterministic hash-derived vector so the Spark-side plumbing
  (schema, batching, partitioning, UDF signatures) stays fully
  exercised and tested end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, mime:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def attach_media(df: DataFrame, id_col: str, payload_col: str,
                 kind: str, mime: str) -> DataFrame:
    """Wrap an existing binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# real decode kernels (stdlib + numpy only)
# --------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload)) as w:
        n, ch, width = w.getnframes(), w.getnchannels(), w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM unsupported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 array."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) images are decodable "
                                  "without codec libraries")
    # header: P6 <w> <h> <maxval> then one whitespace byte, then raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end of line
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                       # the single separator byte
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Down/up-sample by block averaging on an index grid (deterministic)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h // out_h).clip(1, h)
    xs = (np.arange(out_w + 1) * w // out_w).clip(1, w)
    out = np.empty((out_h, out_w, img.shape[2]), dtype=np.float64)
    csum = img.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
    pad = np.zeros((h + 1, w + 1, img.shape[2]))
    pad[1:, 1:] = csum
    for i in range(out_h):
        y0, y1 = (0 if i == 0 else ys[i]), ys[i + 1]
        for j in range(out_w):
            x0, x1 = (0 if j == 0 else xs[j]), xs[j + 1]
            area = max((y1 - y0) * (x1 - x0), 1)
            out[i, j] = (pad[y1, x1] - pad[y0, x1]
                         - pad[y1, x0] + pad[y0, x0]) / area
    return out


def _audio_feature(x: np.ndarray, sr: int, dim: int) -> np.ndarray:
    """Windowed RMS energy over ``dim`` equal windows, plus nothing
    fancy — deterministic, codec-free."""
    if len(x) == 0:
        return np.zeros(dim, dtype=np.float32)
    bounds = (np.arange(dim + 1) * len(x)) // dim
    out = np.empty(dim)
    sq = np.concatenate(([0.0], np.cumsum(x * x)))
    for i in range(dim):
        lo, hi = bounds[i], max(bounds[i + 1], bounds[i] + 1)
        out[i] = np.sqrt((sq[hi] - sq[lo]) / (hi - lo))
    return out.astype(np.float32)


def _image_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """Grid-mean intensities: the image block-mean-resized to a grid of
    ~dim/3 cells × 3 channels, flattened and normalized to [0, 1]."""
    cells = max(1, dim // 3)
    gw = int(np.ceil(np.sqrt(cells)))
    gh = int(np.ceil(cells / gw))
    grid = resize_block_mean(img, gh, gw) / 255.0
    flat = grid.reshape(-1)[:dim]
    if len(flat) < dim:
        flat = np.pad(flat, (0, dim - len(flat)))
    return flat.astype(np.float32)


def _decode_feature(payload: bytes, mime: str, dim: int,
                    fake: bool) -> np.ndarray:
    payload = payload or b""
    if mime in ("audio/wav", "audio/x-wav"):
        x, sr = decode_wav(payload)
        return _audio_feature(x, sr, dim)
    if mime == "image/x-portable-pixmap":
        return _image_feature(decode_ppm(payload), dim)
    if not fake:
        raise NotImplementedError(
            f"decoding {mime!r} requires codec libraries not present in "
            "this environment; uncompressed formats (audio/wav, "
            "image/x-portable-pixmap) decode natively, or run with "
            "fake=True for the deterministic plumbing-test kernel")
    # deterministic fake: sha256 of the payload → dim floats in [0, 1)
    h = hashlib.sha256(payload).digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (rng % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = False) -> DataFrame:
    """binary payload → fixed-dim feature vector via mapInPandas
    (Arrow batches; partition-parallel; no per-row Python UDF)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_feature(p, (m or {}).get("mime") or "", dim, fake).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int32"),
                "feature": feats,
            })

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decodable images → block-mean-resized P6 PPM payloads
    (media_id, width, height, payload)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(p or b"")
                small = np.round(resize_block_mean(img, out_h, out_w)) \
                    .clip(0, 255).astype(np.uint8)
                header = f"P6\n{out_w} {out_h}\n255\n".encode()
                ids.append(mid)
                outs.append(header + small.tobytes())
            yield pd.DataFrame({
                "media_id": ids,
                "width": np.full(len(ids), out_w, dtype=np.int32),
                "height": np.full(len(ids), out_h, dtype=np.int32),
                "payload": outs,
            })

    return media.mapInPandas(
        _run, schema="media_id long, width int, height int, payload binary")


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 fake: bool = False) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, frame binary).
    Video containers genuinely need codec libraries, so frame decode
    stays stubbed; with fake=True it emits deterministic slices of the
    payload as stand-in frames (plumbing exercised end-to-end)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                if not fake:
                    raise NotImplementedError(
                        "video frame decode not available in this container")
                dur = (meta or {}).get("duration_ms") or 3000
                n = max(1, dur // every_ms)
                data = payload or b""
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    lo = (i * 97) % max(1, len(data))
                    frames.append(data[lo:lo + 64])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(_run, schema="media_id long, frame_idx int, frame binary")
