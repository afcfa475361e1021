"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata structs.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
partitioning — is real and tested. The codec kernels (JPEG decode,
resampling, frame extraction) are STUBBED deterministically because
the image/audio libraries are not in this container: each stub is a
pure function of the input bytes, so pipelines built on this module
are fully testable and swap in real codecs (PIL/ffmpeg) by replacing
ONE function body, not the Spark plumbing.

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


def _stub_decode_image(data: bytes) -> dict:
    """DETERMINISTIC STUB for image decode. Real impl: PIL.Image.open.

    Derives plausible metadata purely from the bytes so tests are
    stable. Replace this function body (only) to go real."""
    h = hashlib.sha256(data).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "format": ["jpeg", "png", "webp"][h[2] % 3],
        "byte_len": len(data),
        "content_sha": h.hex()[:16],
    }


def _stub_image_embedding(data: bytes, dim: int = 8) -> list[float]:
    """DETERMINISTIC STUB for a vision-model embedding. Real impl: a
    model server or ONNX session per executor (initialized once per
    worker via the iterator pattern below)."""
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
                    metas.append(_stub_decode_image(b))
                    embs.append(_stub_image_embedding(b, embed_dim))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "meta": metas, "embedding": embs}
            )

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame, binary_col: str = "media", id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Video -> sampled frame rows (explode pattern). The STUB cuts
    the byte stream into fixed 'frames'; a real impl keyframes via
    ffmpeg. Output is one row per sampled frame — the relational
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
