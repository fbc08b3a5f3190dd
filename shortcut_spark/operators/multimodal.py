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

The container has no image/audio codec libraries, but two formats need
none: PNG pixel data is stdlib ``zlib`` inflate + per-row unfilter math,
and WAV PCM samples are a ``struct``/numpy unpack — so ``decoder="real"``
REALLY decodes both (:func:`decode_png_pixels`, :func:`decode_wav_samples`,
and the real paths of :func:`decode_features` / :func:`resize_media`).
``decoder="fake"`` remains as a deterministic md5-seeded generator for
plumbing tests that want payload-independent output.
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
    "encode_png",
    "decode_png_pixels",
    "image_ahash",
    "image_near_dups",
    "audio_ahash",
    "audio_near_dups",
    "encode_wav",
    "decode_wav_samples",
    "write_blobs",
    "read_blobs",
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

    ``decoder="real"`` REALLY decodes PNG payloads (stdlib zlib inflate +
    unfilter, :func:`_decode_png_pixels`) and computes mean/std over the
    actual pixels; payloads that aren't decodable PNGs are dropped.
    ``decoder="fake"`` derives 64 deterministic pseudo-pixels from the
    payload's md5 — payload-format-independent plumbing tests.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, shas, sizes, means, stds = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                if decoder == "real":
                    dec = _decode_png_pixels(raw)
                    if dec is None:
                        continue
                    px = np.frombuffer(dec[3], dtype=np.uint8).astype(np.float64)
                else:
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
    dimensions in the metadata.

    ``decoder="real"`` REALLY resizes PNG payloads: decode
    (:func:`_decode_png_pixels`), nearest-neighbor resample to
    width×height (vectorized numpy fancy-indexing, channel count
    preserved), re-encode (:func:`encode_png`); non-PNG payloads are
    dropped. ``decoder="fake"`` emits a deterministic
    width×height-byte grayscale payload derived from the source's md5 —
    payload-format-independent and SQL-reproducible for the oracle."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, sizes = [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                if decoder == "real":
                    dec = _decode_png_pixels(raw)
                    if dec is None:
                        continue
                    w0, h0, ch, px = dec
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(h0, w0, ch)
                    # nearest-neighbor: PIL/OpenCV NEAREST pixel-center map
                    ys = (np.arange(height) * h0) // height
                    xs = (np.arange(width) * w0) // width
                    out = encode_png(
                        arr[ys][:, xs].tobytes(), width, height, channels=ch
                    )
                else:
                    digest_hex = hashlib.md5(raw).hexdigest()
                    out = bytes.fromhex(digest_hex * (-(-n_out // 16)))[:n_out]
                ids.append(i)
                payloads.append(out)
                sizes.append(len(out))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": payloads,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "n_bytes": sizes,
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


# -- real pixel / sample decode (no codec library needed) ---------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(data: bytes, width: int, height: int, bpp: int) -> bytes | None:
    """Reverse PNG scanline filtering (spec §9): each scanline is one
    filter-type byte + width*bpp filtered bytes; reconstruct with the
    Sub/Up/Average/Paeth predictors. Returns the raw pixel bytes
    (row-major, channels interleaved) or None on malformed input."""
    stride = width * bpp
    if len(data) != height * (stride + 1):
        return None
    out = bytearray(height * stride)
    prior = bytes(stride)
    pos = 0
    for r in range(height):
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ftype != 0:
            return None
        out[r * stride : (r + 1) * stride] = row
        prior = bytes(row)
    return bytes(out)


def _decode_png_pixels(raw: bytes):
    """Full REAL PNG decode: signature + IHDR via :func:`_parse_png`, IDAT
    concatenation, stdlib-zlib inflate, per-row unfilter. Supports 8-bit
    depth, color types 0/2/4/6 (byte-per-sample), non-interlaced — the
    common ML-corpus shapes. Returns (width, height, channels, pixels:
    bytes) or None (palette / 16-bit / interlaced / malformed drop, same
    null-safe convention as the header parsers)."""
    import struct
    import zlib

    parsed = _parse_png(raw)
    if parsed is None:
        return None
    w, h, depth, _ctype, channels, interlaced = parsed
    if depth != 8 or interlaced:
        return None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(raw):
        (size,) = struct.unpack_from(">I", raw, pos)
        cid = raw[pos + 4 : pos + 8]
        body = pos + 8
        if body + size > len(raw):
            return None
        if cid == b"IDAT":
            idat += raw[body : body + size]
        elif cid == b"IEND":
            break
        pos = body + size + 4  # skip CRC
    if not idat:
        return None
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    px = _png_unfilter(data, w, h, channels)
    if px is None:
        return None
    return w, h, channels, px


def encode_png(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Write a real PNG (8-bit, color type 0/2/4/6 by ``channels``,
    non-interlaced) from raw row-major pixel bytes. Scanline filters cycle
    None→Sub→Up→Average→Paeth by row index so a decode round-trip
    exercises every unfilter path. Driver side of the
    :func:`decode_png_pixels` certification; also the re-encode half of
    the real :func:`resize_media` path."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixels length != width*height*channels")
    filtered = bytearray()
    prior = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        f = r % 5
        filtered.append(f)
        if f == 0:
            enc = row
        elif f == 1:
            enc = bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            enc = bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (row[i] - (((row[i - channels] if i >= channels else 0) + prior[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:
            enc = bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prior[i],
                        prior[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        filtered += enc
        prior = row

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + chunk(b"IEND", b"")
    )


_PNG_PIXEL_SCHEMA = (
    "id long, width long, height long, n_channels int, n_px long, "
    "sum_px long, min_px int, max_px int, chk long"
)


def decode_png_pixels(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL image decode (pixel layer): zlib-inflate + unfilter every PNG
    payload over Arrow-batched ``mapInPandas`` and emit integer pixel
    statistics — count, sum, min, max, and a position-weighted checksum
    ``chk = Σ px[k]·(k+1)`` (row-major, flattened) that breaks if any
    pixel value OR position is wrong. All-integer output keeps the
    certification hash-exact. Undecodable payloads (palette / 16-bit /
    interlaced / malformed) are dropped.

    100 TB shape: map-only; blobs never shuffle. CPU-bound decode
    parallelism = partition count, exactly like a codec-backed decoder."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "width", "height", "n_channels", "n_px",
                "sum_px", "min_px", "max_px", "chk",
            )}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_png_pixels(bytes(blob) if blob is not None else b"")
                if dec is None:
                    continue
                w, h, channels, px = dec
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(channels)
                out["n_px"].append(arr.size)
                out["sum_px"].append(int(arr.sum()))
                out["min_px"].append(int(arr.min()))
                out["max_px"].append(int(arr.max()))
                out["chk"].append(int((arr * (np.arange(arr.size) + 1)).sum()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, _PNG_PIXEL_SCHEMA
    )


def encode_wav(
    pcm: bytes, sample_rate: int, n_channels: int = 1, bits: int = 16
) -> bytes:
    """Write a real RIFF/WAVE file around raw little-endian PCM bytes —
    driver side of the :func:`decode_wav_samples` certification."""
    import struct

    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


_WAV_SAMPLE_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_samples long, "
    "sum_amp long, min_amp int, max_amp int, chk long"
)


def decode_wav_samples(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL audio decode (sample layer): parse the RIFF header
    (:func:`_parse_wav`), then unpack the PCM data chunk — 16-bit signed
    or 8-bit unsigned, any channel count — with a vectorized numpy
    frombuffer (no per-sample Python). Emits integer amplitude stats and
    the position-weighted checksum ``chk = Σ amp[s]·(s+1)`` over the
    interleaved sample stream; all-integer → hash-exact certification.
    Non-PCM / truncated payloads are dropped."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "sample_rate", "n_channels", "n_samples",
                "sum_amp", "min_amp", "max_amp", "chk",
            )}
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                parsed = _parse_wav(raw)
                if parsed is None:
                    continue
                rate, channels, bits, n_frames = parsed
                if bits not in (8, 16) or n_frames == 0:
                    continue
                # locate the data chunk body (second pass; header parse
                # already validated the chunk walk)
                pos, body, dlen = 12, None, 0
                while pos + 8 <= len(raw):
                    cid = raw[pos : pos + 4]
                    (size,) = struct.unpack_from("<I", raw, pos + 4)
                    if cid == b"data":
                        body = pos + 8
                        dlen = min(size, len(raw) - body)
                        break
                    pos = pos + 8 + size + (size & 1)
                if body is None:
                    continue
                n_vals = n_frames * channels
                if bits == 16:
                    arr = np.frombuffer(raw, dtype="<i2", count=n_vals, offset=body)
                else:
                    arr = np.frombuffer(raw, dtype=np.uint8, count=n_vals, offset=body)
                arr = arr.astype(np.int64)
                out["id"].append(i)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["n_samples"].append(n_frames)
                out["sum_amp"].append(int(arr.sum()))
                out["min_amp"].append(int(arr.min()))
                out["max_amp"].append(int(arr.max()))
                out["chk"].append(int((arr * (np.arange(n_vals) + 1)).sum()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, _WAV_SAMPLE_SCHEMA
    )


def image_ahash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Perceptual AVERAGE-HASH over REAL decoded pixels: inflate +
    unfilter the PNG (:func:`decode_png_pixels` path), collapse channels
    by per-pixel sum, split into an 8×4 block grid (block of pixel (r,j)
    is ((r·8)//h, (j·4)//w) — exact integer bucketing, any dims ≥ 8×4),
    and set bit r·4+c iff the block's mean exceeds the image mean. The
    comparison cross-multiplies exact integer sums (block_sum·n_px >
    total_sum·block_n), so the 32-bit fingerprint is engine-portable —
    the oracle can rebuild it from the pixel formula alone.

    aHash is the image-side analogue of SimHash: brightness-pattern
    robust to re-encoding and mild noise, cheap enough to run inline
    with the decode. Map-only; blobs never shuffle; output (id, ahash).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                dec = _decode_png_pixels(bytes(blob) if blob is not None else b"")
                if dec is None:
                    continue
                w, h, channels, px = dec
                if h < 8 or w < 4:
                    continue
                arr = (
                    np.frombuffer(px, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, channels)
                    .sum(axis=2)
                )
                br = (np.arange(h) * 8) // h
                bc = (np.arange(w) * 4) // w
                blk = br[:, None] * 4 + bc[None, :]
                bsum = np.bincount(blk.ravel(), weights=arr.ravel(), minlength=32).astype(np.int64)
                bn = np.bincount(blk.ravel(), minlength=32).astype(np.int64)
                total = int(arr.sum())
                n = h * w
                bits = (bsum * n) > (total * bn)
                ids.append(i)
                hashes.append(int((bits.astype(np.int64) << np.arange(32)).sum()))
            yield pd.DataFrame({"id": ids, "ahash": pd.array(hashes, dtype="int64")})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, "id long, ahash long"
    )


def image_near_dups(
    df: DataFrame, id_col: str, payload_col: str, max_hamming: int = 3
) -> DataFrame:
    """Image NEAR-DUP pairs by perceptual hash: real decode → aHash →
    block-combination hamming join (the same lossless auto-sized
    candidate generation as text SimHash — pigeonhole guarantees recall
    1.0 at any block count). Pairs between same-hash cliques are quadratic in the
    clique by definition of the output; route mass-duplicate corpora
    through the cluster form (collapse identical hashes first, as
    ``dedup.dup_clusters`` does) when the pair LIST itself is the
    blow-up. Output: (id_a, id_b, hamming)."""
    from .dedup import _fp_hamming_pairs

    fp = image_ahash(df, id_col, payload_col).select(
        F.col("id").alias(id_col), F.col("ahash").alias("simhash")
    )
    return _fp_hamming_pairs(fp, id_col, max_hamming)


def audio_ahash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Energy-envelope fingerprint over REAL decoded PCM: unpack the WAV
    samples (:func:`decode_wav_samples` path), split the interleaved
    sample stream into 32 equal time buckets (sample k → (k·32)//n), and
    set bit b iff the bucket's |amplitude| energy exceeds the stream
    mean — cross-multiplied exact integers, the audio analogue of
    :func:`image_ahash`'s brightness grid. Robust to gain-preserving
    re-encoding and padding-free trims; clips shorter than 32 samples
    are dropped. Map-only; output (id, ahash)."""
    import struct

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(blob) if blob is not None else b""
                parsed = _parse_wav(raw)
                if parsed is None:
                    continue
                rate, channels, bits, n_frames = parsed
                if bits not in (8, 16) or n_frames * channels < 32:
                    continue
                pos, body = 12, None
                while pos + 8 <= len(raw):
                    cid = raw[pos : pos + 4]
                    (size,) = struct.unpack_from("<I", raw, pos + 4)
                    if cid == b"data":
                        body = pos + 8
                        break
                    pos = pos + 8 + size + (size & 1)
                if body is None:
                    continue
                n_vals = n_frames * channels
                dt = "<i2" if bits == 16 else np.uint8
                arr = np.abs(
                    np.frombuffer(raw, dtype=dt, count=n_vals, offset=body).astype(
                        np.int64
                    )
                )
                bk = (np.arange(n_vals) * 32) // n_vals
                esum = np.bincount(bk, weights=arr, minlength=32).astype(np.int64)
                bn = np.bincount(bk, minlength=32).astype(np.int64)
                total = int(arr.sum())
                bits_v = (esum * n_vals) > (total * bn)
                ids.append(i)
                hashes.append(int((bits_v.astype(np.int64) << np.arange(32)).sum()))
            yield pd.DataFrame({"id": ids, "ahash": pd.array(hashes, dtype="int64")})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, "id long, ahash long"
    )


def audio_near_dups(
    df: DataFrame, id_col: str, payload_col: str, max_hamming: int = 3
) -> DataFrame:
    """Audio NEAR-DUP pairs: real PCM decode → energy-envelope hash →
    the same lossless block-combination hamming join as the image/text
    tiers. Output: (id_a, id_b, hamming)."""
    from .dedup import _fp_hamming_pairs

    fp = audio_ahash(df, id_col, payload_col).select(
        F.col("id").alias(id_col), F.col("ahash").alias("simhash")
    )
    return _fp_hamming_pairs(fp, id_col, max_hamming)


def write_blobs(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    out_dir: str,
    ext: str = "bin",
) -> DataFrame:
    """Blob SINK: one file per row, named ``<id>.<ext>`` under
    ``out_dir`` — how decoded/derived media leaves the engine for
    downstream consumers that expect loose files (training loaders,
    labeling UIs). Executor-side ``mapInPandas``: every partition writes
    its own rows, so the sink scales with partitions like any other
    write (plain ``open()`` here is the local-FS stand-in for an
    object-store PUT — the partitioning story is identical). Returns
    (id, path, n_bytes) for manifesting.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, paths, sizes = [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob) if blob is not None else b""
                path = os.path.join(out_dir, f"{i}.{ext}")
                with open(path, "wb") as fh:
                    fh.write(b)
                ids.append(i)
                paths.append(path)
                sizes.append(len(b))
            yield pd.DataFrame({"id": ids, "path": paths, "n_bytes": sizes})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, "id long, path string, n_bytes long"
    )


def read_blobs(spark, path: str, glob: str | None = None) -> DataFrame:
    """Blob SOURCE: Spark's built-in ``binaryFile`` format — the
    ingestion path for media sitting as loose objects (the usual shape
    of a crawled image/audio corpus on object storage). Emits
    (path, modificationTime, length, content) plus a parsed ``blob_id``
    when filenames follow the ``<digits>.<ext>`` convention of
    :func:`write_blobs` (NULL otherwise). Listing parallelizes like any
    file source; content never shuffles — chain straight into the
    decode operators.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    stem = F.regexp_extract(F.col("path"), r"/(\d+)\.[^/.]+$", 1)
    return df.withColumn(
        "blob_id", F.when(stem != "", stem.cast("long")).otherwise(F.lit(None))
    )
