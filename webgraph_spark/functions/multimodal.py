"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched kernels.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` produces a deterministic fake feature
vector from the bytes so the Spark-side plumbing — schema, partitioning,
mapInPandas batch shape, UDF signatures — is real and tested. Swap the
kernel body for PIL/torchaudio/ffmpeg in a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, ok boolean, err string"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata).

    Payload bytes are the ASCII codes of md5('media:<i>') hex repeated
    4x (128 bytes) — engine-portable, so the whole decode->feature chain
    has a bit-replicable ANSI-SQL oracle (``seed`` kept for signature
    stability; payloads are id-determined)."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.md5(f"media:{i}".encode()).hexdigest() * 4).encode()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                16000 if kind == "audio" else None,
                30 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + feature extract': bytes -> unit vector.

    Stands in for a real decoder. Raises on empty payload so the error
    path in the plumbing is exercised too."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real decoder required for empty/streaming payloads")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(dim / len(arr)))
    v = np.tile(arr, reps)[:dim]
    v = v - v.mean()
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape contract: one output row per input row; failures are
    captured per row (ok=false, err) instead of failing the task —
    the posture a 100 TB media scan needs (a corrupt file must not kill
    a 10^6-row partition)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_fake_decode(payload, dim).tolist())
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 - per-row capture
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "ok": oks,
                    "err": errs,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, "
    "scale double, ok boolean, err string"
)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, Arrow batches).

    The geometry is REAL and JVM-free-of-surprises: the output (width,
    height) preserves aspect ratio with the long side clamped to
    ``max_side`` (computed in numpy per batch). The pixel resample is
    the declared stub — payload bytes are strided down by the scale
    factor (a deterministic fake for PIL.Image.resize; the byte-count
    contract len(out) == ceil(len(in)/stride) is what a real kernel
    must also satisfy). One output row per input image; per-row error
    capture like extract_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs, scales, oks, errs = [], [], [], [], [], [], []
            for _, row in pdf.iterrows():
                ids.append(row["media_id"])
                try:
                    w, h = int(row["width"]), int(row["height"])
                    if w <= 0 or h <= 0:
                        raise ValueError(f"bad dimensions {w}x{h}")
                    scale = min(1.0, max_side / max(w, h))
                    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                    payload = row["payload"]
                    if payload is None or len(payload) == 0:
                        raise NotImplementedError(
                            "real decoder required for empty payloads"
                        )
                    stride = max(1, int(round(1 / scale))) if scale < 1 else 1
                    out = bytes(payload)[::stride]
                    payloads.append(bytearray(out))
                    ws.append(nw)
                    hs.append(nh)
                    scales.append(float(scale))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 - per-row capture
                    payloads.append(None)
                    ws.append(None)
                    hs.append(None)
                    scales.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "width": ws,
                    "height": hs,
                    "scale": scales,
                    "ok": oks,
                    "err": errs,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) rows via JVM-side
    sequence/explode — demonstrates fan-out without Python."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
