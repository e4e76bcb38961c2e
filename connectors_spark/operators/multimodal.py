"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) are carried as `binary` columns with a
media_type tag — the Spark-side contract (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested; the actual codec step is
STUBBED because no image/audio libraries exist in this environment:
`decode_media` raises NotImplementedError unless a decoder is registered,
and `fake_decode` provides a deterministic stand-in so the downstream
feature pipeline stays testable end to end.

Mirrors the reference's lazy-attachment design (binary content fetched
and pushed through an extraction sidecar, reference:
libs/connectors_sdk/connectors_sdk/content_extraction.py:125-202;
app/connectors_service/connectors/es/sink.py:541-566): content is a
sidecar column, dropped/kept by projection, and all byte-level work is
batched (mapInPandas over Arrow) — never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_type string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

# registry: media_type -> bytes -> np.ndarray  (plug real codecs here)
_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], np.ndarray]) -> None:
    _DECODERS[media_type] = fn


def decode_media(media_type: str, content: bytes) -> np.ndarray:
    """STUB boundary: raises unless a real decoder was registered."""
    if media_type in _DECODERS:
        return _DECODERS[media_type](content)
    raise NotImplementedError(
        f"no decoder registered for media_type={media_type!r}; "
        "image/audio libs are not available in this environment"
    )


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> uint8 'signal'."""
    return np.frombuffer(content, dtype=np.uint8)


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table as a media table (UTF-8 bytes as payload)."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.lit("application/fake").alias("media_type"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """(doc_id, n_bytes, entropy, mean_byte) via batched byte analysis.

    The Arrow batch arrives as one pandas frame per chunk; all math is
    vectorized NumPy. Swap `fake_decode` for a registered codec to get
    real features at the same plan shape.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                data = (
                    fake_decode(content) if use_fake_decoder
                    else decode_media(mt, content)
                )
                if len(data):
                    counts = np.bincount(data, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / len(data)
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(data.mean())
                else:
                    entropy, mean = 0.0, 0.0
                rows.append({
                    "doc_id": doc_id, "n_bytes": len(content),
                    "entropy": round(entropy, 6), "mean_byte": round(mean, 6),
                })
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "entropy", "mean_byte"]
            )

    return media.mapInPandas(
        feats, schema="doc_id string, n_bytes long, entropy double, mean_byte double"
    )


def fake_image_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in image decoder: bytes -> (height, width)
    uint8 raster (truncate/zero-pad). Registered-codec shape: a real
    decoder returns exactly this (H, W[, C]) ndarray contract."""
    buf = np.frombuffer(content, dtype=np.uint8)
    need = width * height
    if len(buf) < need:
        buf = np.pad(buf, (0, need - len(buf)))
    return buf[:need].reshape(height, width)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the index math is the real
    thing; only the decode producing `img` is stubbed)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[ys][:, xs]


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8,
                  use_fake_decoder: bool = True) -> DataFrame:
    """(doc_id, width, height, pixels) — decode -> nearest-neighbor
    resize -> raw raster bytes, batched over Arrow. Source dimensions
    come from the meta struct (fallback: squarish raster from payload
    size), mirroring how a real pipeline would carry decoder metadata."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            metas = pdf["meta"]
            for i, (doc_id, mt, content) in enumerate(zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            )):
                if not len(content):
                    continue
                m = metas.iloc[i]
                w = m["width"] if m is not None and m["width"] else None
                h = m["height"] if m is not None and m["height"] else None
                if not w or not h:
                    w = max(1, int(np.ceil(np.sqrt(len(content)))))
                    h = max(1, int(np.ceil(len(content) / w)))
                if use_fake_decoder:
                    img = fake_image_decode(content, int(w), int(h))
                else:
                    img = decode_media(mt, content)
                out = resize_nearest(img, out_w, out_h)
                rows.append({
                    "doc_id": doc_id, "width": out_w, "height": out_h,
                    "pixels": out.astype(np.uint8).tobytes(),
                })
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixels"]
            )

    return media.mapInPandas(
        do_resize,
        schema="doc_id string, width int, height int, pixels binary",
    )


def frame_sample(media: DataFrame, n_frames: int = 4,
                 frame_bytes: int = 64) -> DataFrame:
    """(doc_id, frame_idx, frame) — evenly spaced byte windows; the shape
    of video frame-sampling (decode stub notwithstanding)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = len(content)
                if n == 0:
                    continue
                step = max(1, (n - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    off = min(i * step, max(0, n - 1))
                    rows.append({
                        "doc_id": doc_id, "frame_idx": i,
                        "frame": content[off:off + frame_bytes],
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(
        sample, schema="doc_id string, frame_idx int, frame binary"
    )
