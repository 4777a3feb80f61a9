"""Interop loader for the reference's JSON type index.

``tripsu index`` writes ``{"types": [...], "map": {"<u64>": [idx...]}}``
(reference src/index.rs:16-31, serialized in io.rs:58-63) where each map
key is the Rust ``DefaultHasher`` (SipHash-1-3, zero key) of the
serialized subject term. A user migrating from tripsu can hand that
file to ``jobs/tripsu_cli.py pseudo -x type_index.json`` — we join on
the recomputed SipHash of our serialized subject keys
(functions/siphash13.py) instead of the term strings themselves.

The JSON form is a single-node artifact (one in-memory HashMap), so a
driver-side ``json.load`` + ``createDataFrame`` is the honest scale
story: an index too big for one driver was never representable in this
format in the first place — at that point use the parquet index this
repo writes natively.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from ..functions.siphash13 import as_i64, rust_default_hash_str

INDEX_JSON_SCHEMA = StructType(
    [
        StructField("subject_key", LongType(), False),
        StructField("types", ArrayType(StringType()), False),
    ]
)


def load_type_index_json(spark: SparkSession, path: str) -> DataFrame:
    """type_index.json -> (subject_key: long, types: array<string>).

    ``subject_key`` holds the reference's u64 hash reinterpreted as i64
    (Spark LongType is signed; the triples side reinterprets the same
    way, so the join keys agree bit-for-bit)."""
    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    type_names = raw["types"]
    rows = [
        (as_i64(int(key)), [type_names[i] for i in idxs])
        for key, idxs in raw["map"].items()
    ]
    return spark.createDataFrame(rows, INDEX_JSON_SCHEMA)


def dump_type_index_json(index_df: DataFrame) -> str:
    """(subject_key: string, types: array<string>) -> the reference's
    JSON index format, consumable by the reference binary's own
    ``pseudo -x`` (bidirectional interop: round 1 could only READ the
    reference's index; with SipHash-1-3 in hand we can also WRITE one).

    Driver-side by necessity — the format is one JSON object per file
    (a single-node artifact; an index that doesn't fit a driver was
    never representable in it). Types are interned in first-seen order
    over a sorted key iteration, so output is deterministic."""
    type_pos: dict[str, int] = {}
    mapping: dict[str, list[int]] = {}
    rows = index_df.select("subject_key", "types").collect()
    for key, types in sorted((r["subject_key"], r["types"]) for r in rows):
        idxs = []
        for t in sorted(types):
            if t not in type_pos:
                type_pos[t] = len(type_pos)
            idxs.append(type_pos[t])
        mapping[str(rust_default_hash_str(key))] = idxs
    return json.dumps(
        {"types": list(type_pos), "map": mapping}, indent=2, ensure_ascii=False
    )


def _hash_series(keys: pd.Series) -> pd.Series:
    # Literal objects have no key (object_key() is NULL) — propagate the
    # null. Build the nullable-int64 result via an explicit masked array:
    # `astype("Int64")` on an object series CONTAINING None round-trips
    # through float64 and silently corrupts 63-bit hashes (observed:
    # ...050 -> ...048), which made index joins miss for exactly the
    # batches that contained a literal.
    import numpy as np

    vals = np.zeros(len(keys), dtype="int64")
    mask = np.zeros(len(keys), dtype=bool)
    for i, s in enumerate(keys):
        if s is None:
            mask[i] = True
        else:
            vals[i] = as_i64(rust_default_hash_str(s))
    return pd.Series(pd.arrays.IntegerArray(vals, mask))


def rust_hash_key(key: Column) -> Column:
    """Serialized term -> the i64 the reference's index keys it by.
    Arrow-batched pandas UDF (interop path only — the native parquet
    index joins directly on the term string, zero Python). Built lazily:
    pandas_udf return-type parsing needs an active SparkSession."""
    from pyspark.sql.types import LongType

    return F.pandas_udf(_hash_series, LongType())(key)
