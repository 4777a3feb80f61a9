"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(training-data pipeline ops).

The Spark-side plumbing is real and tested: explicit schemas,
``mapInPandas`` with Arrow batches, payload-size-aware partitioning.
Two decode modes:

- ``decode='fake'`` (default) derives deterministic features from the
  payload bytes (length, md5 checksum, pseudo width/height) so results
  are verifiable end-to-end (incl. by the DuckDB oracle);
- ``decode='real'`` parses actual image dimensions from PNG IHDR /
  JPEG SOFn / GIF headers in pure Python (no PIL needed — the only
  decoded features are width/height, which live in fixed-layout
  headers); payloads that aren't a recognized image format get NULL
  dims. Pixel-level features (which WOULD need an image library not in
  this container) remain honestly out of scope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("payload", BinaryType(), True),     # opaque bytes
        StructField("meta", StringType(), True),        # JSON sidecar
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic asset table: document text bytes as the payload
    (stands in for real image/audio bytes; the plumbing — binary
    column, schema, batching — is identical)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col("source"), F.col("lang"))).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carry the dims; 0xC4/0xC8/0xCC look like
# SOF but are DHT/JPG-extension/DAC (ITU T.81 table B.1).
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
# Standalone markers with NO length segment (TEM, RST0-7, SOI, EOI).
_JPEG_BARE = {0x01, *range(0xD0, 0xD8), 0xD8, 0xD9}


def image_dims(payload: bytes | None) -> tuple[int | None, int | None]:
    """(width, height) from a PNG / JPEG / GIF header, else (None, None).

    Pure-Python fixed-layout header parses — the pixel data is never
    touched, so this needs no imaging library and costs O(header) per
    asset regardless of payload size:
    - PNG: 8-byte signature, then the IHDR chunk (always first, spec
      §5.6): 4-byte length, b'IHDR', width/height as 4-byte big-endian.
    - JPEG: SOI then marker segments; walk lengths until an SOFn
      (0xC0-0xCF minus DHT/JPG/DAC), whose body is precision(1),
      height(2 BE), width(2 BE).
    - GIF: 'GIF87a'/'GIF89a', then width/height as 2-byte LITTLE-endian.
    Truncated/corrupt headers fall through to (None, None), never raise.
    """
    if not payload:
        return None, None
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(b)
        while i + 1 < n:
            if b[i] != 0xFF:  # not a marker: corrupt/entropy data — stop
                return None, None
            while i < n and b[i] == 0xFF:  # fill bytes collapse
                i += 1
            if i >= n:
                return None, None
            marker = b[i]
            i += 1
            if marker in _JPEG_BARE:
                continue
            if i + 2 > n:
                return None, None
            seg_len = int.from_bytes(b[i : i + 2], "big")
            if marker in _JPEG_SOF:
                if i + 7 > n:
                    return None, None
                height = int.from_bytes(b[i + 3 : i + 5], "big")
                width = int.from_bytes(b[i + 5 : i + 7], "big")
                return width, height
            i += seg_len
        return None, None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    return None, None


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    fake decode: width = (byte0_of_md5 % 64 + 1) * 16,
                 height = (byte1_of_md5 % 64 + 1) * 16 — deterministic
    from the checksum, so an engine-independent oracle can recompute it.

    real decode: width/height parsed from the payload's own PNG/JPEG/
    GIF header (``image_dims``); unrecognized payloads get NULL dims.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    real = decode == "real"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            digests = [
                hashlib.md5(bytes(p) if p is not None else b"").hexdigest()
                for p in payloads
            ]
            if real:
                dims = [image_dims(p) for p in payloads]
                width = pd.array([w for w, _ in dims], dtype="Int32")
                height = pd.array([h for _, h in dims], dtype="Int32")
            else:
                width = [(int(d[0:2], 16) % 64 + 1) * 16 for d in digests]
                height = [(int(d[2:4], 16) % 64 + 1) * 16 for d in digests]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "checksum": digests,
                    "width": width,
                    "height": height,
                }
            )

    # Opaque functions defeat column pruning (guide §4.1): without the
    # explicit select, the unused `meta` JSON sidecar would be computed
    # and shipped through Arrow into every Python worker just to be
    # dropped. Pass exactly what the function reads.
    return assets.select("asset_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def multimodal_features(documents: DataFrame) -> DataFrame:
    return extract_features(assets_from_documents(documents))


def multimodal_features_oracle() -> str:
    """DuckDB recomputation of the fake decode (md5 over the same
    UTF-8 bytes; hex pairs -> pseudo dimensions)."""
    return """
SELECT doc_id AS asset_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  md5(text) AS checksum,
  CAST((CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) % 64 + 1) * 16 AS INT) AS width,
  CAST((CAST(('0x' || substr(md5(text), 3, 2)) AS INTEGER) % 64 + 1) * 16 AS INT) AS height
FROM documents
"""
