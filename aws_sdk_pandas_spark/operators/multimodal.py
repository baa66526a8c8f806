"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder exercises the
real Spark plumbing (schema, batching, partitioning) end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical multimodal schema: opaque payload + typed metadata
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed kernel: the payload
    digest expanded to ``dim`` floats in [0,1)."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return [float(x) for x in out[:dim]]


def extract_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    fake: bool = False,
    batch_size: int = 256,
) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas``.

    The Spark side is real: Arrow batch transfer, per-partition streaming,
    stable output schema.  The kernel is stubbed: pass ``fake=True`` for
    the deterministic fake, otherwise NotImplementedError surfaces from
    the executors (no decode libs in this environment).
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries not "
                    "present in this environment; pass fake=True to exercise "
                    "the pipeline"
                )
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype(str),
                        "feature": [
                            _fake_feature(bytes(p) if p is not None else b"", dim)
                            for p in chunk[payload_col]
                        ],
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk[payload_col]],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(_map, schema=_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Plan video frame sampling declaratively: one output row per sampled
    timestamp (the actual frame decode is the stubbed kernel above).
    Pure ``sequence``+``explode`` — the expensive fan-out happens JVM-side
    and partitions naturally."""
    return (
        df.select(id_col, duration_col)
        .where(F.col(duration_col).isNotNull())
        .withColumn(
            "sample_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col(duration_col), F.lit(every_ms))),
        )
    )


_DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def decode_image(payload: bytes):
    """STUB — image decode kernel.  No image library ships in this
    container; the Spark-side plumbing (``decode_images`` below) is real
    and tested with the deterministic fake."""
    raise NotImplementedError(
        "image decoding requires an image library (e.g. Pillow) not present "
        "in this environment"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Deterministic fake decode: digest-derived dimensions + pixel bytes."""
    h = hashlib.sha256(payload).digest()
    w, ht = 1 + h[0] % 64, 1 + h[1] % 64
    return w, ht, (h * ((w * ht) // len(h) + 1))[: w * ht]


def decode_images(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads to (width, height, pixel bytes) via
    ``mapInPandas`` (Arrow-batched; one Python worker per partition).
    Kernel stubbed: ``fake=True`` runs the deterministic fake decoder."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                decode_image(b"")  # raises NotImplementedError
            decoded = [
                _fake_decode(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixels": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_map, schema=_DECODED_IMAGE_SCHEMA)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Resize kernel over ``mapInPandas``; stubbed like ``decode_images``
    (fake path emits ``target_width*target_height`` deterministic bytes)."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_width * target_height
        for pdf in batches:
            if not fake:
                decode_image(b"")
            out = []
            for p in pdf[payload_col]:
                h = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                out.append((h * (n // len(h) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "width": target_width,
                    "height": target_height,
                    "pixels": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_map, schema=_DECODED_IMAGE_SCHEMA)


def chunk_audio_plan(
    df: DataFrame,
    *,
    window_ms: int = 10_000,
    overlap_ms: int = 0,
    sample_rate_col: str = "sample_rate",
    n_samples_col: str = "n_samples",
    id_col: str = "media_id",
) -> DataFrame:
    """Plan audio windowing declaratively from typed metadata: one row
    per (media, chunk) with sample offsets — the audio analog of
    ``frame_sample_plan``, and the input shape an ASR/feature pipeline
    feeds to the (stubbed) decode kernel.  Pure sequence+explode,
    JVM-side; chunk boundaries derive from ``sample_rate`` and
    ``n_samples`` metadata, the binary payload is never touched here.

    Returns ``id_col, chunk_idx, start_sample, end_sample`` where
    windows are ``window_ms`` wide and advance ``window_ms -
    overlap_ms`` (overlap preserved for boundary-spanning events).
    """
    if overlap_ms >= window_ms:
        raise ValueError("overlap_ms must be smaller than window_ms")
    base = df.select(
        id_col,
        F.col(sample_rate_col).alias("__sr"),
        F.col(n_samples_col).alias("__n"),
    ).where(
        F.col(n_samples_col).isNotNull()
        & F.col(sample_rate_col).isNotNull()
        & (F.col(n_samples_col) > 0)
    )
    # long arithmetic BEFORE the multiply: int32 sample_rate * window_ms
    # overflows at 48 kHz x 60 s windows
    win = (F.col("__sr").cast("long") * window_ms / 1000).cast("long")
    step = (F.col("__sr").cast("long") * (window_ms - overlap_ms) / 1000).cast("long")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("__n") - win) / step.cast("double")) + F.lit(1)
    ).cast("int")
    out = base.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    start = F.col("chunk_idx").cast("long") * step
    end = F.least(start + win, F.col("__n"))
    return out.select(
        id_col,
        "chunk_idx",
        start.alias("start_sample"),
        end.alias("end_sample"),
    )
