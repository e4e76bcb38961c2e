"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) are carried as `binary` columns with a
media_type tag — the Spark-side contract (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested. The codec registry now
ships REAL pure-NumPy decoders for the uncompressed formats (PPM/PGM
rasters `decode_ppm`, RIFF/WAVE PCM16 `decode_wav_pcm` — registered by
default); only COMPRESSED codecs (jpeg/png/mp3/h264) remain a declared
STUB boundary because their libraries do not exist in this environment:
`decode_media` raises NotImplementedError for unregistered types, and
`fake_decode` remains as a deterministic stand-in for pipeline tests.

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
    """Decode via the registry. Uncompressed formats (PPM/PGM, WAV
    PCM16) have real built-in decoders below; compressed codecs are the
    remaining STUB boundary: unregistered types raise."""
    if media_type in _DECODERS:
        return _DECODERS[media_type](content)
    raise NotImplementedError(
        f"no decoder registered for media_type={media_type!r}; "
        "compressed-codec libs are not available in this environment"
    )


# ---------------------------------------------------------------
# REAL decoders: pure NumPy, no external libs (uncompressed formats)
# ---------------------------------------------------------------


def decode_ppm(content: bytes) -> np.ndarray:
    """Netpbm binary raster decoder (public spec): P6 (RGB) ->
    (H, W, 3) uint8, P5 (grayscale) -> (H, W) uint8. Handles
    whitespace-separated header tokens and '#' comments; maxval must be
    <= 255 (8-bit)."""
    if not content.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM payload")
    is_rgb = content[:2] == b"P6"
    # tokenize the header: magic, width, height, maxval (comments skipped)
    tokens, i, n = [], 2, len(content)
    while len(tokens) < 3 and i < n:
        c = content[i:i + 1]
        if c == b"#":
            while i < n and content[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not content[j:j + 1].isspace():
                j += 1
            tokens.append(int(content[i:j]))
            i = j
    i += 1  # single whitespace after maxval, then raw bytes
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported (maxval > 255)")
    ch = 3 if is_rgb else 1
    raw = np.frombuffer(content, dtype=np.uint8, count=w * h * ch, offset=i)
    arr = raw.reshape(h, w, ch)
    return arr if is_rgb else arr[:, :, 0]


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of decode_ppm (round-trip fixture builder)."""
    if img.ndim == 3:
        h, w, _ = img.shape
        head = f"P6\n{w} {h}\n255\n".encode()
    else:
        h, w = img.shape
        head = f"P5\n{w} {h}\n255\n".encode()
    return head + img.astype(np.uint8).tobytes()


def decode_wav_pcm(content: bytes) -> np.ndarray:
    """Minimal RIFF/WAVE PCM16 decoder (public spec): walks the chunk
    list, reads `fmt ` (must be format 1 = PCM, 16-bit) and `data`,
    returns (n_samples, n_channels) int16."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(content)
    channels = bits = None
    data = None
    while i + 8 <= n:
        cid = content[i:i + 4]
        size = int.from_bytes(content[i + 4:i + 8], "little")
        body = content[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt not in (1, 7):  # PCM / G.711 mu-law
                raise ValueError(f"compressed WAV (format {fmt}) unsupported")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or channels is None:
        raise ValueError("missing fmt/data chunk")
    if fmt == 7:
        # G.711 mu-law (public ITU-T spec): 8-bit companded -> int16
        if bits != 8:
            raise ValueError(f"{bits}-bit mu-law unsupported (want 8)")
        u = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        u = ~u & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = ((mant << 3) + 0x84) << exp
        pcm = (mag - 0x84).astype(np.int64)
        pcm = np.where(sign != 0, -pcm, pcm)
        return pcm.astype(np.int16).reshape(-1, channels)
    if bits != 16:
        raise ValueError(f"{bits}-bit PCM unsupported (want 16)")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels)


def encode_wav_pcm(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Inverse of decode_wav_pcm (round-trip fixture builder).
    samples: (n, channels) int16."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    dchunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt + dchunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


register_decoder("image/x-portable-pixmap", decode_ppm)
register_decoder("image/x-portable-graymap", decode_ppm)
register_decoder("audio/wav", decode_wav_pcm)


def audio_features(media: DataFrame, frame_len: int = 400) -> DataFrame:
    """(doc_id, n_samples, n_channels, rms, zero_cross_rate,
    frame_energy_max): real audio features through the registered
    decoder, Arrow-batched, all NumPy — the shape of an audio
    quality/VAD pre-filter in a training-data pipeline."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "n_samples", "n_channels", "rms",
                "zero_cross_rate", "frame_energy_max"]
        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                pcm = decode_media(mt, bytes(content))
                x = pcm.astype(np.float64).mean(axis=1) / 32768.0
                if not len(x):
                    continue
                rms = float(np.sqrt((x ** 2).mean()))
                zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) \
                    if len(x) > 1 else 0.0
                nf = len(x) // frame_len
                if nf:
                    fr = x[: nf * frame_len].reshape(nf, frame_len)
                    fe = float((fr ** 2).mean(axis=1).max())
                else:
                    fe = float((x ** 2).mean())
                rows.append({
                    "doc_id": doc_id, "n_samples": int(pcm.shape[0]),
                    "n_channels": int(pcm.shape[1]),
                    "rms": round(rms, 6), "zero_cross_rate": round(zc, 6),
                    "frame_energy_max": round(fe, 6),
                })
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        feats,
        schema="doc_id string, n_samples long, n_channels int, rms double, "
               "zero_cross_rate double, frame_energy_max double",
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


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit Windows BMP (public BITMAPINFOHEADER spec)
    -> (H, W, 3) uint8 RGB. Handles the 4-byte row padding, BGR
    channel order, and both bottom-up (positive height) and top-down
    (negative height) row layouts; compressed/other-depth BMPs raise —
    they stay on the declared codec-stub boundary."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = int.from_bytes(content[10:14], "little")
    hdr_size = int.from_bytes(content[14:18], "little")
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMPs unsupported")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression}) — compressed BMPs are on the "
            f"declared stub boundary")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = pixel_off + row_bytes * h
    if len(content) < need:
        raise ValueError("truncated BMP pixel array")
    raw = np.frombuffer(content, dtype=np.uint8,
                        count=row_bytes * h, offset=pixel_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> bottom-up uncompressed 24-bit BMP
    (round-trip fixture for decode_bmp)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += img[r, :, ::-1].tobytes() + b"\x00" * pad
    size = 54 + len(body)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
           + (54).to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + b"\x00" * 16)
    return bytes(hdr + body)


register_decoder("image/bmp", decode_bmp)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash — the standard perceptual
    image-dedup fingerprint, public technique): integer-exact luma
    ((299r + 587g + 114b) // 1000), nearest resize to 9x8, horizontal
    gradient bits row-major, returned as a SIGNED 64-bit value
    (two's complement, so Spark long and DuckDB BIGINT carry it
    bit-identically)."""
    if img.ndim == 3:
        g = (img[:, :, 0].astype(np.int64) * 299
             + img[:, :, 1].astype(np.int64) * 587
             + img[:, :, 2].astype(np.int64) * 114) // 1000
    else:
        g = img.astype(np.int64)
    small = resize_nearest(g, 9, 8)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def synth_class_image(img_class: int, w: int = 24, h: int = 24) -> np.ndarray:
    """Deterministic RGB test image per class: a diagonal gradient
    whose orientation/frequency depend on the class — classes differ
    structurally (far dHashes) except each class 4k+3 is a LIGHTLY
    PERTURBED copy of class 4k+2 (near-dup pair: +3 brightness on one
    interior pixel region, which dHash is designed to absorb)."""
    base_kind = img_class if img_class % 4 != 3 else img_class - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
    k = base_kind + 1
    r = (xx * k * 11 + yy * 3) % 256
    g = (yy * k * 7 + xx * 5) % 256
    b = (xx * 2 + yy * k * 13) % 256
    img = np.stack([r, g, b], axis=2).astype(np.int64)
    if img_class % 4 == 3:
        img[:, 8:11, 0] += 40  # red stripe perturbation
    return np.clip(img, 0, 255).astype(np.uint8)


def image_dhash_classes(media: DataFrame, id_col: str = "doc_id",
                        n_classes: int = 12) -> DataFrame:
    """(img_class, dhash, n_docs): per image-class perceptual hash
    computed by the REAL path — synthesize the class PPM payload,
    decode with the registered decoder, luma + resize + gradient bits
    — inside ONE Arrow-batched mapInPandas stage, then a hash-keyed
    agg. The per-doc work is pure NumPy; the hash is a deterministic
    function of doc_id % n_classes (frozen-table oracle, the
    audio_features pattern)."""
    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[int, int] = {}
        for pdf in batches:
            cls = (pdf[id_col] % n_classes).astype("int64")
            out = []
            for c in cls:
                c = int(c)
                hv = memo.get(c)
                if hv is None:
                    payload = encode_ppm(synth_class_image(c))
                    hv = dhash64(decode_media("image/x-portable-pixmap",
                                              payload))
                    memo[c] = hv
                out.append(hv)
            yield pd.DataFrame({"img_class": cls, "dhash": out})

    hashed = media.select(id_col).mapInPandas(
        hashes, "img_class long, dhash long")
    return hashed.groupBy("img_class", "dhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
