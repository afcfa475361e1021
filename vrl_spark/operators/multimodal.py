"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata structs.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
partitioning — is real and tested. Kernels are real wherever the
stdlib suffices: image metadata (PNG/GIF/BMP/JPEG header parsing),
full raster decode + nearest-neighbor resize + visual features for
uncompressed 24-bit BMP, 8-bit RGB/RGBA PNG (IDAT is zlib-deflate:
inflate + scanline unfilter, stdlib+numpy), AND baseline JPEG (a
from-scratch T.81 sequential decoder — Huffman, dequant, IDCT,
4:2:0/4:2:2 upsampling, restart markers; operators/jpeg.py), plus
complete PCM WAV audio decode + signal features (``wave`` + numpy),
progressive JPEG (T.81 Annex G — spectral selection + successive
approximation), and video keyframing via real scene-cut detection
over the uncompressed RVID container (difference-energy
thresholding). Only ffmpeg-demuxed video containers remain
env-blocked — swapping a demuxer in replaces ONE function body
(_decode_rvid), not the cut detector or the Spark plumbing.

Design points for 100 TB of media:
- binary payloads never pass through JVM String (binary -> Arrow ->
  bytes in Python, zero re-encoding).
- mapInPandas streams RecordBatches: one batch in flight per task,
  so executor memory is bounded by batch size, not partition size
  (arrow.maxRecordsPerBatch caps rows per batch; media rows are
  large, so set it low for media tables).
- decode outputs are fixed-size feature structs, not decoded rasters:
  shuffle bytes stay O(features), the raster dies inside the task.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("content_sha", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("meta", IMAGE_META_SCHEMA),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _sniff_image(data: bytes):
    """REAL container-header parsing, stdlib-only: (format, w, h) for
    PNG / GIF / BMP / JPEG, else None. No codec library needed —
    dimensions live in the headers."""
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", w, h
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return "bmp", w, abs(h)
    if data[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to the first SOF marker
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    return None


def _decode_image_meta(data: bytes) -> dict:
    """Image metadata: REAL header decode for png/gif/bmp/jpeg;
    unknown containers fall back to deterministic hash-derived values
    (stable for tests; a full raster codec like PIL would slot in
    here without touching the Spark plumbing)."""
    h = hashlib.sha256(data).digest()
    sniffed = _sniff_image(data)
    if sniffed is not None:
        fmt, w, hh = sniffed
        return {
            "width": w, "height": hh, "format": fmt,
            "byte_len": len(data), "content_sha": h.hex()[:16],
        }
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "format": ["jpeg", "png", "webp"][h[2] % 3],
        "byte_len": len(data),
        "content_sha": h.hex()[:16],
    }


def decode_bmp_pixels(data: bytes):
    """REAL raster decode for uncompressed 24-bit BMP (stdlib+numpy):
    returns an HxWx3 uint8 RGB array, or None if not such a BMP.
    Proves the decode->raster->feature path end-to-end without any
    codec library."""
    import struct

    import numpy as np

    if data[:2] != b"BM" or len(data) < 54:
        return None
    pix_off = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0:
        return None
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + row_bytes * h
    if len(data) < need:
        return None
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BMP stores BGR
    return rgb[::-1] if flip else rgb  # bottom-up unless height < 0


def decode_png_pixels(data: bytes):
    """REAL raster decode for 8-bit RGB/RGBA non-interlaced PNG,
    stdlib-only: IDAT is zlib-deflate, so ``zlib`` + per-scanline
    unfiltering (PNG filters 0-4) recovers exact pixels. Returns an
    HxWxC uint8 array (C = 3 or 4), or None for other PNG flavors
    (palette/16-bit/interlaced) and non-PNGs.

    Filters Up/None vectorize fully; Sub/Average/Paeth carry a
    left-pixel dependency and scan bytes within the row — correct
    first, and plenty for the feature path's thumbnails."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + crc
    if ihdr is None or not idat:
        return None
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6) or comp or filt or interlace:
        return None
    ch = 3 if color_type == 2 else 4
    stride = w * ch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    p = 0
    for y in range(h):
        ft = raw[p]
        p += 1
        line = np.frombuffer(raw, np.uint8, stride, p).astype(np.int32)
        p += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ft == 1:  # Sub
                    v = line[x] + a
                elif ft == 3:  # Average
                    v = line[x] + ((a + b) >> 1)
                elif ft == 4:  # Paeth
                    c = int(prev[x - ch]) if x >= ch else 0
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    return None  # invalid filter byte
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def resize_nearest(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize on an HxWxC array (pure numpy index
    math — the real resize kernel for the feature path)."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def _image_embedding(data: bytes, dim: int = 8) -> list[float]:
    """Image feature vector. For decodable rasters — 24-bit BMP,
    8-bit RGB/RGBA PNG (stdlib zlib decode), and baseline JPEG
    (operators/jpeg.py, from-scratch T.81) — this is REAL:
    nearest-resize to 2x2 then per-cell mean luminance + global RGB
    means/std, an honest tiny visual descriptor. Other containers get
    the deterministic hash stub (a model embedding would slot in
    here, initialized once per task)."""
    px = decode_bmp_pixels(data)
    if px is None:
        px = decode_png_pixels(data)
        if px is not None:
            px = px[:, :, :3]  # drop alpha for the visual descriptor
    if px is None:
        from vrl_spark.operators.jpeg import decode_jpeg_pixels

        px = decode_jpeg_pixels(data)
    if px is not None:
        import numpy as np

        small = resize_nearest(px, 2, 2).astype(np.float64)
        lum = (small @ np.array([0.299, 0.587, 0.114])) / 255.0
        rgb = px.reshape(-1, 3).astype(np.float64) / 255.0
        feats = list(lum.flatten()) + list(rgb.mean(axis=0)) + [float(rgb.std())]
        return [round(float(v), 6) for v in feats[:dim]] + [0.0] * max(0, dim - 8)
    h = hashlib.sha256(b"emb|" + data).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def decode_images(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id",
    embed_dim: int = 8,
) -> DataFrame:
    """binary media column -> (id, meta struct, embedding) via
    mapInPandas. Iterator form: per-task one-time init (where a real
    codec/model would load) happens before the batch loop."""
    out_schema = IMAGE_FEATURES_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time per-task init goes here (model/codec handles)
        for pdf in batches:
            metas, embs = [], []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    embs.append(None)
                else:
                    b = bytes(data)
                    metas.append(_decode_image_meta(b))
                    embs.append(_image_embedding(b, embed_dim))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "meta": metas, "embedding": embs}
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


RVID_MAGIC = b"RVID"


def encode_rvid(frames) -> bytes:
    """Minimal uncompressed video container: ``RVID`` + u16 width +
    u16 height + u32 n_frames, then n_frames rasters of raw RGB24
    (h*w*3 bytes each, row-major). The demuxable-without-ffmpeg dual
    of the BMP/WAV paths — ``frames`` is an (n, h, w, 3) uint8
    array."""
    import struct

    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = a.shape
    if c != 3:
        raise ValueError("frames must be (n, h, w, 3) RGB24")
    return (RVID_MAGIC + struct.pack("<HHI", w, h, n)
            + a.tobytes(order="C"))


def _decode_rvid(data: bytes):
    """(n, h, w, 3) uint8 array, or None if not RVID / truncated."""
    import struct

    import numpy as np

    if data[:4] != RVID_MAGIC or len(data) < 12:
        return None
    w, h, n = struct.unpack("<HHI", data[4:12])
    need = n * h * w * 3
    if w == 0 or h == 0 or n == 0 or len(data) < 12 + need:
        return None
    return np.frombuffer(data, np.uint8, need, 12).reshape(n, h, w, 3)


VIDEO_KEYFRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("diff_energy", T.DoubleType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
    T.StructField("frame_sha", T.StringType()),
])


def video_keyframes(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id",
    threshold: float = 2.0,
) -> DataFrame:
    """Video -> keyframe rows via REAL scene-cut detection over the
    RVID container: per-frame difference energy (mean |RGB delta| vs
    the previous frame), a frame is a keyframe when its energy
    exceeds ``threshold`` x the video's mean difference energy (frame
    0 always is). Emits the frame's energy, mean color, and content
    sha — fixed-size features, the raster dies inside the task.

    ffmpeg-demuxed containers stay env-blocked; swapping a demuxer in
    replaces _decode_rvid only, the cut detector and the Spark
    plumbing (mapInPandas, Arrow batching, explode shape) are real
    and container-agnostic. Non-RVID payloads are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, energies, rgbs, shas = [], [], [], [], []
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                if data is None:
                    continue
                frames = _decode_rvid(bytes(data))
                if frames is None:
                    continue
                f = frames.astype(np.float64)
                # diff energy per frame (frame 0: vs itself = 0)
                d = np.abs(np.diff(f, axis=0)).mean(axis=(1, 2, 3))
                d = np.concatenate([[0.0], d])
                cut = d > threshold * d.mean() if d.mean() > 0 \
                    else np.zeros(len(d), dtype=bool)
                cut[0] = True
                for k in np.flatnonzero(cut):
                    ids.append(i)
                    idxs.append(int(k))
                    energies.append(float(d[k]))
                    rgbs.append(f[k].mean(axis=(0, 1)).tolist())
                    shas.append(hashlib.sha256(
                        frames[k].tobytes()).hexdigest()[:16])
            if not ids:
                continue  # empty float64 frames break Arrow list cols
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs, "diff_energy": energies,
                "mean_rgb": pd.Series(rgbs, dtype=object),
                "frame_sha": shas,
            })

    return df.select(id_col, binary_col).mapInPandas(
        run, VIDEO_KEYFRAMES_SCHEMA
    )


def frame_sample(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Video -> sampled frame rows (explode pattern) for UNKNOWN
    containers: the fallback cuts the byte stream into fixed
    'frames'; for the RVID container use video_keyframes (real cut
    detection). Output is one row per sampled frame — the relational
    shape downstream vision stages want."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for i, data in zip(pdf[id_col], pdf[binary_col]):
                if data is None:
                    continue
                b = bytes(data)
                n_frames = max(1, len(b) // 64)
                for f_idx in range(0, n_frames, every_n):
                    chunk = b[f_idx * 64 : (f_idx + 1) * 64]
                    ids.append(i)
                    idxs.append(f_idx)
                    shas.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select(id_col, binary_col).mapInPandas(run, schema)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("meta", T.StructType([
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_width", T.IntegerType()),
    ])),
    T.StructField("features", T.StructType([
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ])),
])


def decode_audio(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """binary WAV column -> (id, meta, signal features) via
    mapInPandas. FULLY REAL for PCM WAV (stdlib ``wave`` + numpy):
    channels/rate/frames from the container, RMS / peak /
    zero-crossing-rate from the decoded samples. Non-WAV (or
    non-PCM) rows -> NULL meta+features, the error branch — exactly
    the fallible-parse contract of the text functions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def one(data: bytes):
            try:
                with wave.open(io.BytesIO(data)) as w:
                    ch, sw, rate, nf = (
                        w.getnchannels(), w.getsampwidth(),
                        w.getframerate(), w.getnframes(),
                    )
                    raw = w.readframes(nf)
            except Exception:
                return None, None
            meta = {
                "channels": ch, "sample_rate": rate, "n_frames": nf,
                "duration_ms": (nf * 1000) // rate if rate else 0,
                "sample_width": sw,
            }
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
            if dtype is None or nf == 0:
                return meta, None
            x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
            if sw == 1:
                # 8-bit PCM WAV is UNSIGNED, centered at 128 (digital
                # silence = 128, not 0) — recenter before scaling
                x = x - 128.0
            scale = float(2 ** (8 * sw - 1))
            x = x / scale
            feats = {
                "rms": float(np.sqrt(np.mean(x * x))),
                "peak": float(np.max(np.abs(x))),
                "zero_cross_rate": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))),
            }
            return meta, feats

        for pdf in batches:
            metas, featss = [], []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    featss.append(None)
                else:
                    m, f = one(bytes(data))
                    metas.append(m)
                    featss.append(f)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "meta": metas, "features": featss}
            )

    return df.select(id_col, binary_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
