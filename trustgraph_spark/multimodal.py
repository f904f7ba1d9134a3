"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature libraries are not in this container, so the decode step
is a clearly-marked stub (deterministic fake by default, NotImplementedError
in strict mode) — but the Spark-side plumbing is real and tested: schema,
Arrow batch shape, mapInPandas signatures, partition-size control for large
blobs. A real decoder (PIL/ffmpeg/torchaudio) drops into ``decode_fn``
without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image / audio / video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque blob
    ]
)


def _bounded_batches(
    batches: Iterator[pd.DataFrame], batch_rows: int
) -> Iterator[pd.DataFrame]:
    """Sub-chunk incoming Arrow batches so per-batch memory stays bounded
    for large blobs — shared by every decode seam in this module."""
    for pdf in batches:
        for start in range(0, len(pdf), batch_rows):
            yield pdf.iloc[start : start + batch_rows]


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a fixed-size
    feature vector from the payload bytes. STUB — replace with a real
    image/audio decode when the codec libs are available."""
    if payload is None:
        return np.zeros(16, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:64].ljust(64, b"\0"), dtype=np.uint8)[:16].astype(np.float32) / 255.0


def strict_decode(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this image; "
        "plug a real decoder into extract_media_features(decode_fn=...)"
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    feature_dim: int = 16,
    batch_rows: int = 64,
) -> DataFrame:
    """payload -> feature vector via mapInPandas. Small Arrow batches
    (batch_rows) keep per-batch memory bounded for large blobs — set
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly for real media.
    Returns (media_id, kind, feature array<float>)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for part in _bounded_batches(batches, batch_rows):
            feats = [
                [float(x) for x in decode_fn(p, k)[:feature_dim]]
                for p, k in zip(part["payload"], part["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": part["media_id"].values,
                    "kind": part["kind"].values,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (sequence + explode; the actual frame grab is the decode
    stub's job). Shows the partitioning shape: one row per (media_id, ts)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: re-derives a payload of
    size proportional to the target box from the source bytes. STUB — a
    real implementation decodes with PIL/opencv and re-encodes; the Spark
    plumbing around it (schema, batching, metadata rewrite) is identical."""
    if payload is None:
        return b""
    h = hashlib.sha256(bytes(payload) + f"{width}x{height}".encode()).digest()
    size = max(1, (width * height) // 256)
    return (h * (size // len(h) + 1))[:size]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] = fake_resize,
    batch_rows: int = 64,
) -> DataFrame:
    """Image resize plumbing: rows with kind='image' get their payload
    replaced by resize_fn output and width/height metadata rewritten;
    non-image rows pass through untouched. mapInPandas with bounded Arrow
    batches (large blobs); output keeps MEDIA_SCHEMA so resized tables are
    drop-in replacements."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for chunk in _bounded_batches(batches, batch_rows):
            part = chunk.copy()
            is_img = part["kind"] == "image"
            part.loc[is_img, "payload"] = part.loc[is_img, "payload"].map(
                lambda p: bytearray(resize_fn(p, width, height))
            )
            part.loc[is_img, "width"] = width
            part.loc[is_img, "height"] = height
            yield part

    return media.mapInPandas(gen, MEDIA_SCHEMA)


# --- document (PDF) decoding ------------------------------------------------
# Reference: decoding/pdf/pdf_decoder.py — base64 payload, %PDF- magic
# validation (_looks_like_pdf:35-36), non-PDF documents dropped with a
# logged error (:130-134), PyPDFLoader page split -> one TextDocument per
# page.  PyPDF is not in this container, so page extraction is the same
# declared stub seam as media decode; the validation, base64 handling, and
# per-page explode plumbing are real.


def looks_like_pdf(col):
    """%PDF- magic check on a binary column (pdf_decoder.py:35-36), as a
    pure column expression: lstrip ASCII whitespace then prefix match.
    Inspects a 4096-byte head (the reference lstrips the whole payload;
    more than 4 KB of leading whitespace before the magic is not a real
    PDF) — bounded so huge blobs never round-trip through a string."""
    head = F.decode(F.substring(col, 1, 4096), "ISO-8859-1")
    # regexp strip (F.ltrim removes spaces only; bytes.lstrip() in the
    # reference removes all ASCII whitespace incl. \n \t \r)
    return F.regexp_replace(head, r"^\s+", "").startswith("%PDF-")


def fake_pdf_pages(payload: bytes) -> list[str]:
    """Deterministic stand-in for PyPDF page extraction. STUB — a real
    loader drops into decode_documents(pages_fn=...)."""
    if payload is None:
        return []
    h = hashlib.sha256(payload).hexdigest()
    n = int(h[:2], 16) % 3 + 1
    return [f"page {i + 1} of {h[:12]}" for i in range(n)]


def strict_pdf_pages(payload: bytes) -> list[str]:
    raise NotImplementedError(
        "PDF decoding requires pypdf, not present in this image; plug a "
        "real loader into decode_documents(pages_fn=...)"
    )


def decode_documents(
    docs: DataFrame,
    pages_fn: Callable[[bytes], list[str]] = fake_pdf_pages,
    id_col: str = "doc_id",
    data_col: str = "data",
    base64_encoded: bool = False,
    batch_rows: int = 16,
) -> DataFrame:
    """Binary documents -> one row per extracted page
    (doc_id, page, text), mirroring decoding/pdf: optional base64 decode,
    %PDF- magic validation (non-PDF rows DROP, as the reference logs and
    ignores them), then the pluggable page-extraction seam over small
    Arrow batches (large blobs — keep batches tiny)."""
    src = docs
    if base64_encoded:
        # try_to_binary: malformed base64 -> NULL -> fails the magic
        # check and drops, like the reference's log-and-ignore; plain
        # unbase64 would ABORT the job under ANSI mode
        src = src.withColumn(
            data_col,
            F.try_to_binary(F.col(data_col).cast("string"), F.lit("base64")),
        )
    valid = src.where(looks_like_pdf(F.col(data_col)))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("page", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for part in _bounded_batches(batches, batch_rows):
            rows = []
            for _, r in part.iterrows():
                for i, text in enumerate(pages_fn(r[data_col])):
                    rows.append((str(r[id_col]), i + 1, text))
            yield pd.DataFrame(rows, columns=["doc_id", "page", "text"])

    return valid.select(id_col, data_col).mapInPandas(gen, schema=out_schema)


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        # ASCII-hex payload bytes: opaque to Spark (BinaryType), but
        # reproducible by the DuckDB oracle (whose sha256 is VARCHAR-only)
        payload = (hashlib.sha256(f"media-{i}".encode()).hexdigest() * 4).encode()
        rows.append(
            (
                f"m{i}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# stdlib decoders: REAL decode paths with no external codec libraries
# ---------------------------------------------------------------------------
#
# The container has no PIL/ffmpeg/torchaudio, but two media families ARE
# decodable with the standard library alone: RIFF/WAVE PCM audio (the
# ``wave`` module) and uncompressed 24-bit BMP images (fixed-layout
# headers). These make the decode seam genuinely real — bytes in,
# sample/pixel arrays out, features computed from the actual signal —
# while compressed formats (JPEG/PNG/MP4) keep the declared stub.

import io
import struct
import wave as _wave


def decode_wav_pcm(payload: bytes):
    """Decode RIFF/WAVE PCM bytes to (int16 sample array, sample_rate)
    using the stdlib ``wave`` reader — a real audio decode, no codec libs.
    Mono 16-bit only (the synth contract); raises on anything else."""
    with _wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected mono 16-bit PCM")
        frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, dtype="<i2"), w.getframerate()


def decode_bmp_rgb(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) to an
    (h, w, 3) uint8 RGB array — a real hand-written image parser: header
    offsets, bottom-up row order, 4-byte row padding, BGR->RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    row_size = (width * 3 + 3) // 4 * 4
    out = np.empty((abs(height), width, 3), dtype=np.uint8)
    bottom_up = height > 0
    for row in range(abs(height)):
        src = data_offset + row * row_size
        line = np.frombuffer(payload, dtype=np.uint8,
                             count=width * 3, offset=src).reshape(width, 3)
        y = (abs(height) - 1 - row) if bottom_up else row
        out[y] = line[:, ::-1]  # BGR -> RGB
    return out


def stdlib_decode(payload: bytes, kind: str, n_bands: int = 16) -> np.ndarray:
    """REAL decode_fn for the feature seam: sniffs the payload magic and
    computes features from the decoded signal — per-band RMS energy over
    the PCM samples for WAV, a luma histogram over the decoded pixels for
    BMP. Unknown/compressed formats raise the same declared-stub error as
    strict_decode."""
    if payload is not None and payload[:4] == b"RIFF":
        samples, _sr = decode_wav_pcm(payload)
        norm = samples.astype(np.float64) / 32768.0
        # array_split keeps the tail samples (remainder spread over the
        # first bands) and short clips yield 0.0 for empty bands instead
        # of NaN; divisible lengths (the synth contract) split exactly
        return np.array([
            float(np.sqrt(np.mean(band ** 2))) if len(band) else 0.0
            for band in np.array_split(norm, n_bands)
        ])
    if payload is not None and payload[:2] == b"BM":
        rgb = decode_bmp_rgb(payload).astype(np.int64)
        luma = (rgb[..., 0] * 299 + rgb[..., 1] * 587
                + rgb[..., 2] * 114) // 1000
        bins = np.bincount((luma // (256 // n_bands)).ravel(),
                           minlength=n_bands)[:n_bands]
        return bins.astype(np.float64) / luma.size
    return strict_decode(payload, kind)


def synth_wav_payload(seed: int, sr: int = 8000, n: int = 4000) -> bytes:
    """Deterministic mono 16-bit PCM sawtooth at frequency
    200 + (seed % 8) * 100 Hz — INTEGER sample math
    (((i*f) % sr) * 65535 // sr - 32768) so an analytic oracle reproduces
    every sample exactly."""
    f = 200 + (seed % 8) * 100
    i = np.arange(n, dtype=np.int64)
    v = ((i * f) % sr) * 65535 // sr - 32768
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(v.astype("<i2").tobytes())
    return buf.getvalue()


def synth_bmp_payload(seed: int, size: int = 8) -> bytes:
    """Deterministic gray gradient BMP: every pixel r=g=b=luma with
    luma(x, y) = (x*16 + y*2 + (seed % 7) * 3) % 256 — integer math the
    oracle reproduces exactly; written bottom-up as a real BMP."""
    row_size = (size * 3 + 3) // 4 * 4
    data_size = row_size * size
    header = b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, size, size, 1, 24, 0,
                      data_size, 2835, 2835, 0, 0)
    rows = []
    for row in range(size):  # bottom-up: row 0 is the BOTTOM scanline
        y = size - 1 - row
        line = bytearray()
        for x in range(size):
            luma = (x * 16 + y * 2 + (seed % 7) * 3) % 256
            line += bytes([luma, luma, luma])  # BGR (equal channels)
        line += b"\0" * (row_size - len(line))
        rows.append(bytes(line))
    return header + dib + b"".join(rows)


def synth_stdlib_media(docs: DataFrame) -> DataFrame:
    """Media table with REAL payloads synthesized per document — WAV for
    even doc_ids, BMP for odd — via a bounded mapInPandas (payload
    construction is the ingest-side seam; the synthesizers live in the
    package for executor pickling)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                n = int(did)
                if n % 2 == 0:
                    rows.append({"media_id": f"m{n}", "kind": "audio",
                                 "payload": synth_wav_payload(n)})
                else:
                    rows.append({"media_id": f"m{n}", "kind": "image",
                                 "payload": synth_bmp_payload(n)})
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    return docs.select("doc_id").mapInPandas(
        gen, "media_id string, kind string, payload binary"
    )
