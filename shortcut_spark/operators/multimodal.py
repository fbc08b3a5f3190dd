"""Multimodal column convention + processing plumbing.

Media payloads are opaque ``binary`` columns next to a typed metadata
struct — the 100 TB-friendly layout: parquet keeps blobs contiguous and
column-pruned away unless a query touches them, and all metadata predicates
(mime, dimensions, duration) push down without reading a byte of payload.

    media struct<mime string, width int, height int, duration_ms long,
                 sha256 string, n_bytes long>

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so each
Python worker sees a columnar batch of blobs — the only sane shape for
CPU-bound media work on a cluster (batch amortizes serde; partition count
controls decode parallelism).

The container has no image/audio codecs, so the actual decode is stubbed
(`NotImplementedError`) behind ``decoder="real"``; ``decoder="fake"`` is a
deterministic md5-seeded pixel generator that keeps every Spark-side piece
— schema, batching, partitioning, UDF signatures — real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META",
    "attach_media",
    "filter_by_meta",
    "decode_features",
    "resize_media",
    "frame_sample_plan",
    "audio_chunk_plan",
    "parse_wav_meta",
    "audio_chunk_plan_wav",
    "parse_png_meta",
    "image_tile_plan",
]

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, width=None, height=None, duration_ms=None
) -> DataFrame:
    """Wrap a binary column into the (payload, media-meta) convention.
    sha256/size are computed JVM-side (no Python)."""
    p = F.col(payload_col)
    meta = F.struct(
        F.lit(mime).alias("mime"),
        (F.lit(width) if width is not None else F.lit(None)).cast("int").alias("width"),
        (F.lit(height) if height is not None else F.lit(None)).cast("int").alias("height"),
        (F.lit(duration_ms) if duration_ms is not None else F.lit(None)).cast("long").alias("duration_ms"),
        F.sha2(p, 256).alias("sha256"),
        F.length(p).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media", meta)


def filter_by_meta(df: DataFrame, **bounds) -> DataFrame:
    """Predicate on metadata only — never touches payload bytes (parquet
    column pruning keeps the blob column unread)."""
    out = df
    for key, val in bounds.items():
        out = out.filter(F.col(f"media.{key}") == F.lit(val))
    return out


_FEAT_SCHEMA = "id long, sha256 string, n_bytes long, mean_px double, std_px double"


def decode_features(
    df: DataFrame, id_col: str, payload_col: str, decoder: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """Per-blob feature extraction over ``mapInPandas``.

    ``decoder="real"`` raises NotImplementedError (no codecs in this
    container — plug PIL/ffmpeg there on a real cluster). ``decoder="fake"``
    derives 64 deterministic pseudo-pixels from the payload's md5 and
    computes mean/std — exercising the exact Arrow batch path a real decoder
    would use.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg on the executors; "
                    "use decoder='fake' for plumbing tests"
                )
            ids, shas, sizes, means, stds = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(raw).digest()
                px = np.frombuffer((digest * 4)[:64], dtype=np.uint8).astype(np.float64)
                ids.append(i)
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                means.append(float(px.mean()))
                stds.append(float(px.std()))
            yield pd.DataFrame(
                {"id": ids, "sha256": shas, "n_bytes": sizes, "mean_px": means, "std_px": stds}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, _FEAT_SCHEMA)


_RESIZE_SCHEMA = "id long, payload binary, width int, height int, n_bytes long"


def resize_media(
    df: DataFrame, id_col: str, payload_col: str, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Resize step over ``mapInPandas`` — binary in, binary out, new
    dimensions in the metadata. ``decoder="real"`` raises (no codecs in
    this container; plug PIL there). ``decoder="fake"`` emits a
    deterministic width×height-byte grayscale payload derived from the
    source's md5 (the digest hex repeated and re-binarized), so the full
    binary→Python→binary round trip is exercised AND the output is
    reproducible in SQL for the oracle."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize needs PIL on the executors; "
                    "use decoder='fake' for plumbing tests"
                )
            ids, payloads = [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                digest_hex = hashlib.md5(raw).hexdigest()
                out = bytes.fromhex(digest_hex * (-(-n_out // 16)))[:n_out]
                ids.append(i)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "n_bytes": [n_out] * len(ids),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, _RESIZE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media item, frame timestamp)
    derived from duration metadata — pure JVM-side sequence explode; the
    actual frame grab would be a decode_features-style mapInPandas over this
    plan joined back to payloads."""
    n = F.floor(F.col("media.duration_ms") / F.lit(float(every_ms))).cast("int")
    return (
        df.filter(F.col("media.duration_ms").isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n)).alias("frame_i"),
        )
        .select(
            F.col(id_col),
            F.col("frame_i").cast("long").alias("frame_i"),
            (F.col("frame_i") * F.lit(every_ms)).cast("long").alias("frame_ts_ms"),
        )
    )


_WAV_META_SCHEMA = (
    "id long, sample_rate int, n_channels int, bits_per_sample int, "
    "n_samples long, duration_ms long"
)


def _parse_wav(raw: bytes):
    """Parse a RIFF/WAVE header: walk the chunk list, read fmt's rate/
    channels/bit depth and data's byte length. PCM needs no codec library
    — this is the one media format the container can decode for REAL.
    Returns (rate, channels, bits, n_samples) or None if not a PCM WAV."""
    import struct

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, block_align, data_len = 12, None, None, None, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = pos + 8
        if cid == b"fmt " and size >= 16 and body + 16 <= len(raw):
            _fmt, channels, rate, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", raw, body
            )
        elif cid == b"data":
            data_len = min(size, len(raw) - body)
        pos = body + size + (size & 1)  # RIFF chunks pad to even
    if not rate or not block_align or data_len is None:
        return None
    return rate, channels, bits, data_len // block_align


def parse_wav_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL audio decode (header layer): pure-Python RIFF/WAVE parse over
    Arrow-batched ``mapInPandas`` — the one decoder that needs no codec
    dependency, so unlike the image paths it is NOT stubbed. Extracts
    per-blob (sample_rate, n_channels, bits_per_sample, exact n_samples,
    duration_ms) from the fmt/data chunks. Non-WAV / truncated payloads
    are dropped (null-safe superset-style: downstream plans only ever see
    rows that really parsed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "sample_rate", "n_channels", "bits_per_sample",
                "n_samples", "duration_ms",
            )}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_wav(bytes(blob) if blob is not None else b"")
                if parsed is None:
                    continue
                rate, channels, bits, n_samples = parsed
                out["id"].append(i)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(n_samples)
                out["duration_ms"].append(int(n_samples * 1000 // rate))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, _WAV_META_SCHEMA
    )


def audio_chunk_plan_wav(
    df: DataFrame, id_col: str, payload_col: str, chunk_ms: int = 30_000
) -> DataFrame:
    """:func:`audio_chunk_plan` driven by REAL parsed WAV headers instead
    of trusted metadata: each file's chunk width comes from its OWN parsed
    sample rate (mixed-rate corpora chunk correctly), and n_samples is the
    exact data-chunk length — no stub anywhere in this path. Chunk math
    stays JVM-side; only the header parse is Python (Arrow-batched).

    Output: (id, sample_rate, chunk_i, start_sample, end_sample)."""
    meta = parse_wav_meta(df, id_col, payload_col)
    spc = (F.col("sample_rate").cast("long") * F.lit(chunk_ms)) / F.lit(1000)
    spc = spc.cast("long")
    last = F.greatest(
        F.ceil(F.col("n_samples") / spc.cast("double")).cast("long") - F.lit(1),
        F.lit(0),
    )
    return (
        meta.filter(F.col("n_samples") > 0)
        .select(
            F.col("id").alias(id_col),
            "sample_rate",
            "n_samples",
            spc.alias("__spc"),
            F.explode(F.sequence(F.lit(0), last)).alias("chunk_i"),
        )
        .select(
            F.col(id_col),
            "sample_rate",
            F.col("chunk_i").cast("long").alias("chunk_i"),
            (F.col("chunk_i") * F.col("__spc")).cast("long").alias("start_sample"),
            F.least(
                F.col("chunk_i") * F.col("__spc") + F.col("__spc"), F.col("n_samples")
            ).cast("long").alias("end_sample"),
        )
    )


def audio_chunk_plan(
    df: DataFrame,
    id_col: str,
    chunk_ms: int = 30_000,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Audio chunking *plan*: one row per (media item, chunk) with exact
    sample offsets, derived from sample-count metadata — the audio twin of
    :func:`frame_sample_plan` (ASR/embedding pipelines consume fixed
    windows, e.g. 30 s). Pure JVM-side sequence explode; the actual PCM
    slice would be a ``decode_features``-style ``mapInPandas`` over this
    plan joined back to payloads. The final (possibly short) chunk is
    emitted with its true end offset.

    Expects ``media.n_samples`` metadata; rows without it are skipped.

    Output: (id, chunk_i, start_sample, end_sample).
    """
    spc = int(sample_rate * chunk_ms / 1000)  # samples per chunk
    ns = F.col("media.n_samples")
    last = F.greatest(
        F.ceil(ns / F.lit(float(spc))).cast("long") - F.lit(1), F.lit(0)
    )
    return (
        df.filter(ns.isNotNull() & (ns > 0))
        .select(F.col(id_col), ns.alias("__ns"), F.explode(F.sequence(F.lit(0), last)).alias("chunk_i"))
        .select(
            F.col(id_col),
            F.col("chunk_i").cast("long").alias("chunk_i"),
            (F.col("chunk_i") * spc).cast("long").alias("start_sample"),
            F.least(F.col("chunk_i") * spc + spc, F.col("__ns")).cast("long").alias("end_sample"),
        )
    )


# -- real image decode (header layer): PNG -----------------------------------

_PNG_META_SCHEMA = (
    "id long, width long, height long, bit_depth int, color_type int, "
    "n_channels int, interlaced boolean"
)

# channels per PNG color type (spec §11.2.2): gray, rgb, palette,
# gray+alpha, rgba
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(raw: bytes):
    """Parse a PNG signature + IHDR chunk: (width, height, bit_depth,
    color_type, n_channels, interlaced) or None if not a well-formed PNG.
    Pure byte arithmetic — the IHDR layer needs no codec library (pixel
    data would need zlib + defiltering; that stays behind the stubbed
    decoder)."""
    import struct

    if len(raw) < 33 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    (length,) = struct.unpack_from(">I", raw, 8)
    if length != 13 or raw[12:16] != b"IHDR":
        return None
    w, h, depth, ctype, comp, filt, inter = struct.unpack_from(">IIBBBBB", raw, 16)
    if comp != 0 or filt != 0 or inter not in (0, 1) or w == 0 or h == 0:
        return None
    channels = _PNG_CHANNELS.get(ctype)
    if channels is None:
        return None
    return w, h, depth, ctype, channels, bool(inter)


def parse_png_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL image decode (header layer): pure-Python PNG signature + IHDR
    parse over Arrow-batched ``mapInPandas`` — like :func:`parse_wav_meta`,
    the one image decoder that needs no codec dependency, so it is NOT
    stubbed. Extracts per-blob (width, height, bit_depth, color_type,
    n_channels, interlaced). Non-PNG / malformed payloads are dropped
    (downstream plans only see rows that really parsed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "width", "height", "bit_depth", "color_type",
                "n_channels", "interlaced",
            )}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_png(bytes(blob) if blob is not None else b"")
                if parsed is None:
                    continue
                w, h, depth, ctype, channels, inter = parsed
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(depth)
                out["color_type"].append(ctype)
                out["n_channels"].append(channels)
                out["interlaced"].append(inter)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, _PNG_META_SCHEMA
    )


def image_tile_plan(
    df: DataFrame, id_col: str, payload_col: str, tile: int = 224
) -> DataFrame:
    """Tiling *plan* from REAL parsed PNG headers: one row per (image,
    tile) with exact pixel bounds, each image tiled by its OWN parsed
    dimensions — the vision-pipeline analogue of
    :func:`audio_chunk_plan_wav` (patch extraction for a ViT-style
    encoder plans here; the pixel crop runs wherever the stubbed decoder
    does). Edge tiles are clipped, so bounds always cover the image
    exactly once. Tile math stays JVM-side; only the header parse is
    Python (Arrow-batched).

    Output: (id, width, height, tile_i, tile_j, x0, y0, x1, y1)."""
    meta = parse_png_meta(df, id_col, payload_col)
    nx = F.ceil(F.col("width") / F.lit(tile)).cast("long")
    ny = F.ceil(F.col("height") / F.lit(tile)).cast("long")
    return (
        meta.select(
            F.col("id").alias(id_col),
            "width",
            "height",
            F.explode(F.sequence(F.lit(0), ny - 1)).alias("tile_i"),
            nx.alias("__nx"),
        )
        .select(
            F.col(id_col),
            "width",
            "height",
            "tile_i",
            F.explode(F.sequence(F.lit(0), F.col("__nx") - 1)).alias("tile_j"),
        )
        .select(
            F.col(id_col),
            "width",
            "height",
            F.col("tile_i").cast("long").alias("tile_i"),
            F.col("tile_j").cast("long").alias("tile_j"),
            (F.col("tile_j") * tile).cast("long").alias("x0"),
            (F.col("tile_i") * tile).cast("long").alias("y0"),
            F.least(F.col("tile_j") * tile + tile, F.col("width")).cast("long").alias("x1"),
            F.least(F.col("tile_i") * tile + tile, F.col("height")).cast("long").alias("y1"),
        )
    )
