"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a struct of
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators.  The codec libraries are not
in this container, so the decode kernel is STUBBED: by default it
raises ``NotImplementedError``; with ``fake=True`` it produces a
deterministic hash-derived feature vector so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is fully exercised
and tested end-to-end.
"""

from __future__ import annotations

import hashlib
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


def _decode_stub(payload: bytes, kind: str, dim: int, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio codec libraries not present "
            "in this environment; run with fake=True for the deterministic "
            "plumbing-test kernel")
    # deterministic fake: sha256 of the payload → dim floats in [0, 1)
    h = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (rng % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = False) -> DataFrame:
    """binary payload → fixed-dim feature vector via mapInPandas
    (Arrow batches; partition-parallel; no per-row Python UDF)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, dim, fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int32"),
                "feature": feats,
            })

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 fake: bool = False) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, frame binary).
    Frame decode is stubbed like ``extract_features``; with fake=True it
    emits deterministic slices of the payload as stand-in frames."""

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
