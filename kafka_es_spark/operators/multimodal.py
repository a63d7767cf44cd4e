"""Multimodal column plumbing — image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The Spark-side machinery (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual codec work is STUBBED because
image/audio libraries are not in this container:

* with ``fake=True`` (default) the decoders parse a deterministic synthetic
  header (``KESIMG01``/``KESAUD01`` + big-endian dims) so round-trip tests
  exercise the full distributed path with real bytes;
* with ``fake=False`` they raise NotImplementedError("codec not bundled")
  at the batch level — swap in PIL/libsndfile calls there in a real deploy.

Scale notes: media blobs stay in executor memory one Arrow batch at a time
(cap bytes per batch via spark.sql.execution.arrow.maxRecordsPerBatch);
feature rows are small → downstream joins broadcast.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

_IMG_MAGIC = b"KESIMG01"
_AUD_MAGIC = b"KESAUD01"


def fake_image_bytes(width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack(">II", width, height) + pixels.tobytes()


def fake_audio_bytes(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 1000).astype(np.int16)
    return _AUD_MAGIC + struct.pack(">IQ", sample_rate, n_samples) + samples.tobytes()


def decode_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """image payload → (width, height, mean_luma). mapInPandas: one Arrow
    batch per iteration, numpy decode — no per-row Python at plan level."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, False))
                    continue
                buf = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "real image codec not bundled in this container; "
                        "plug PIL.Image.open(io.BytesIO(buf)) here"
                    )
                if not buf.startswith(_IMG_MAGIC):
                    rows.append((mid, None, None, None, False))
                    continue
                w, h = struct.unpack(">II", buf[8:16])
                px = np.frombuffer(buf[16 : 16 + w * h], dtype=np.uint8)
                rows.append((mid, int(w), int(h), round(float(px.mean()), 4), True))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "ok"]
            )

    return media.filter(media.kind == "image").select("media_id", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def decode_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None, False))
                    continue
                buf = bytes(payload)
                if not fake:
                    raise NotImplementedError("real audio codec not bundled")
                if not buf.startswith(_AUD_MAGIC):
                    rows.append((mid, None, None, None, False))
                    continue
                sr, n = struct.unpack(">IQ", buf[8:20])
                samples = np.frombuffer(buf[20 : 20 + 2 * n], dtype=np.int16).astype(np.float64)
                rms = float(np.sqrt((samples**2).mean())) if n else 0.0
                rows.append((mid, int(sr), int(n), round(rms, 4), True))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "rms", "ok"]
            )

    return media.filter(media.kind == "audio").select("media_id", "payload").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """image payload → resized payload (nearest-neighbor on the fake format;
    NotImplementedError for real codecs)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError("real image codec not bundled")
                if not buf.startswith(_IMG_MAGIC):
                    rows.append((mid, None))
                    continue
                w, h = struct.unpack(">II", buf[8:16])
                px = np.frombuffer(buf[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)
                yi = (np.arange(height) * h // height).clip(0, h - 1)
                xi = (np.arange(width) * w // width).clip(0, w - 1)
                out = px[np.ix_(yi, xi)].astype(np.uint8)
                rows.append(
                    (mid, _IMG_MAGIC + struct.pack(">II", width, height) + out.tobytes())
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return media.filter(media.kind == "image").select("media_id", "payload").mapInPandas(
        run, out_schema
    )
