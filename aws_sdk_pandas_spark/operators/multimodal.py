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


# ---------------------------------------------------------------------------
# Real header parsing (no media libs needed): format sniffing and image
# dimensions come straight from the container headers.  PNG/GIF/BMP keep
# their dimensions at FIXED byte offsets, so those parse as pure JVM
# expressions (substring + hex + conv — whole-stage codegen, zero Python);
# JPEG stores them in a variable-position SOF segment, so only jpeg rows
# pay an Arrow-batched Python scan.
# ---------------------------------------------------------------------------


def _be_u(col, pos: int, n: int):
    """Big-endian unsigned int from ``n`` bytes at 1-based ``pos``."""
    return F.conv(F.hex(F.substring(col, pos, n)), 16, 10).cast("long")


def _le_u(col, pos: int, n: int):
    """Little-endian unsigned int from ``n`` bytes at 1-based ``pos``."""
    total = F.lit(0).cast("long")
    for i in range(n):
        total = total + _be_u(col, pos + i, 1) * F.lit(256**i).cast("long")
    return total


def sniff_format(col) -> "F.Column":
    """Container format from magic bytes — pure JVM, no UDF:
    png | gif | bmp | jpeg | wav | unknown."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(F.substring(c, 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n"), "png")
        .when(F.substring(c, 1, 6).isin(F.lit(b"GIF87a"), F.lit(b"GIF89a")), "gif")
        .when(
            (F.substring(c, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(c, 9, 4) == F.lit(b"WAVE")),
            "wav",
        )
        .when(F.substring(c, 1, 2) == F.lit(b"BM"), "bmp")
        .when(F.substring(c, 1, 2) == F.lit(b"\xff\xd8"), "jpeg")
        .otherwise("unknown")
    )


def _jpeg_dims_py(b: bytes | None) -> tuple[int | None, int | None]:
    """Walk JPEG segments to the first SOF marker; (width, height)."""
    if not b or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return (None, None)
    sof = frozenset(
        (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
    )
    i, n = 2, len(b)
    while i + 3 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xFF, 0x00):
            i += 1
            continue
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if marker in sof:
            if i + 9 <= n:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return (w, h)
            return (None, None)
        if seglen < 2:
            return (None, None)
        i += 2 + seglen
    return (None, None)


def image_dimensions(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    out_prefix: str = "img",
    jpeg: bool = True,
) -> DataFrame:
    """Adds ``<prefix>_format``, ``<prefix>_width``, ``<prefix>_height``
    parsed from the payload's container header.

    PNG (IHDR, big-endian at offset 16), GIF (logical screen, little-
    endian at 6) and BMP (BITMAPINFOHEADER, little-endian int32 at 18,
    negative height = top-down orientation) are fixed-offset: pure
    codegen expressions, the scan never leaves the JVM.  JPEG dimensions
    live in a variable-position SOF segment — with ``jpeg=True`` one
    Arrow-batched kernel walks the segments, short-circuiting instantly
    on non-JPEG rows (the magic check is the first two bytes), so the
    cost is the Arrow transfer of the payload column, paid only when
    the caller asks for JPEG support.
    """
    c = F.col(payload_col)
    fmt = sniff_format(c)
    long_enough = F.length(c)
    png_ok = (fmt == "png") & (long_enough >= 24)
    gif_ok = (fmt == "gif") & (long_enough >= 10)
    bmp_ok = (fmt == "bmp") & (long_enough >= 26)
    bmp_h_raw = _le_u(c, 23, 4)
    bmp_h = F.when(bmp_h_raw >= 2**31, F.lit(2**32) - bmp_h_raw).otherwise(bmp_h_raw)
    width = (
        F.when(png_ok, _be_u(c, 17, 4))
        .when(gif_ok, _le_u(c, 7, 2))
        .when(bmp_ok, _le_u(c, 19, 4))
    )
    height = (
        F.when(png_ok, _be_u(c, 21, 4))
        .when(gif_ok, _le_u(c, 9, 2))
        .when(bmp_ok, bmp_h)
    )
    out = (
        df.withColumn(f"{out_prefix}_format", fmt)
        .withColumn(f"{out_prefix}_width", width.cast("int"))
        .withColumn(f"{out_prefix}_height", height.cast("int"))
    )
    if jpeg:
        @F.pandas_udf("width int, height int")
        def _jpeg_dims(payloads: pd.Series) -> pd.DataFrame:
            dims = [_jpeg_dims_py(p) for p in payloads]
            return pd.DataFrame({"width": [d[0] for d in dims], "height": [d[1] for d in dims]})

        jd = _jpeg_dims(c)
        out = out.withColumn(
            f"{out_prefix}_width",
            F.when(F.col(f"{out_prefix}_format") == "jpeg", jd["width"]).otherwise(
                F.col(f"{out_prefix}_width")
            ),
        ).withColumn(
            f"{out_prefix}_height",
            F.when(F.col(f"{out_prefix}_format") == "jpeg", jd["height"]).otherwise(
                F.col(f"{out_prefix}_height")
            ),
        )
    return out


def _wav_meta_py(b: bytes | None) -> tuple | None:
    """RIFF chunk walk: (channels, sample_rate, bits, duration_ms)."""
    if not b or len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    ch = sr = byte_rate = bits = data_len = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            ch = int.from_bytes(b[i + 10 : i + 12], "little")
            sr = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if sr is None:
        return None
    dur = (data_len * 1000 // byte_rate) if (data_len and byte_rate) else None
    return (ch, sr, bits, dur)


def audio_metadata(
    df: DataFrame, payload_col: str = "payload", *, out_prefix: str = "audio"
) -> DataFrame:
    """Adds ``<prefix>_channels``, ``<prefix>_sample_rate``,
    ``<prefix>_bits``, ``<prefix>_duration_ms`` parsed from WAV/RIFF
    headers (chunk walk — fmt/data chunks are not at fixed offsets, so
    this is one Arrow-batched kernel; non-WAV rows short-circuit on the
    12-byte magic).  Feeds ``chunk_audio_plan`` with real metadata
    instead of caller-supplied columns."""
    @F.pandas_udf("channels int, sample_rate int, bits int, duration_ms bigint")
    def _meta(payloads: pd.Series) -> pd.DataFrame:
        rows = [_wav_meta_py(p) or (None, None, None, None) for p in payloads]
        return pd.DataFrame(
            rows, columns=["channels", "sample_rate", "bits", "duration_ms"]
        )

    m = _meta(F.col(payload_col))
    return (
        df.withColumn(f"{out_prefix}_channels", m["channels"])
        .withColumn(f"{out_prefix}_sample_rate", m["sample_rate"])
        .withColumn(f"{out_prefix}_bits", m["bits"])
        .withColumn(f"{out_prefix}_duration_ms", m["duration_ms"])
    )


def make_test_media(fmt: str, width: int = 0, height: int = 0, **kw) -> bytes:
    """Minimal valid headers for tests and gate fixtures (deterministic,
    stdlib-only): png | gif | bmp | jpeg | wav."""
    import struct as _s

    if fmt == "png":
        return (
            b"\x89PNG\r\n\x1a\n"
            + _s.pack(">I", 13)
            + b"IHDR"
            + _s.pack(">II", width, height)
            + b"\x08\x02\x00\x00\x00"
        )
    if fmt == "gif":
        return b"GIF89a" + _s.pack("<HH", width, height) + b"\x00\x00\x00"
    if fmt == "bmp":
        return (
            b"BM"
            + _s.pack("<IHHI", 26, 0, 0, 26)
            + _s.pack("<IiiHH", 40, width, kw.get("signed_height", height), 1, 24)
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", height, width) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    if fmt == "wav":
        sr = kw.get("sample_rate", 16000)
        ch = kw.get("channels", 1)
        bits = kw.get("bits", 16)
        n_frames = kw.get("n_frames", sr)  # 1 second default
        byte_rate = sr * ch * bits // 8
        data = b"\x00" * (n_frames * ch * bits // 8)
        fmt_chunk = b"fmt " + _s.pack("<IHHIIHH", 16, 1, ch, sr, byte_rate, ch * bits // 8, bits)
        data_chunk = b"data" + _s.pack("<I", len(data)) + data
        body = b"WAVE" + fmt_chunk + data_chunk
        return b"RIFF" + _s.pack("<I", len(body)) + body
    raise ValueError(f"unknown test media format: {fmt}")
