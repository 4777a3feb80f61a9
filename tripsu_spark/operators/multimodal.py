"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(training-data pipeline ops).

The Spark-side plumbing is real and tested: explicit schemas,
``mapInPandas`` with Arrow batches, payload-size-aware partitioning.
The DECODE step is a STUB — image/audio libraries are not in this
container. ``decode='fake'`` (default) derives deterministic features
from the payload bytes (length, md5 checksum, pseudo width/height) so
results are verifiable end-to-end (incl. by the DuckDB oracle);
``decode='real'`` raises NotImplementedError unless PIL is importable.
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


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    fake decode: width = (byte0_of_md5 % 64 + 1) * 16,
                 height = (byte1_of_md5 % 64 + 1) * 16 — deterministic
    from the checksum, so an engine-independent oracle can recompute it.
    """
    if decode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "real decode needs pillow/torchaudio, not present in this "
                "container — use decode='fake'"
            ) from exc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            digests = [
                hashlib.md5(bytes(p) if p is not None else b"").hexdigest()
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "checksum": digests,
                    "width": [(int(d[0:2], 16) % 64 + 1) * 16 for d in digests],
                    "height": [(int(d[2:4], 16) % 64 + 1) * 16 for d in digests],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


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
