"""De-pseudonymization: recover originals from a (hash -> original)
mapping table (BASELINE.json metric names "round-trip
de-pseudonymization tests"; the reference has no such subcommand — a
trusted party holding the key derives the mapping, SURVEY.md §5).

``build_mapping``: for every distinct IRI / literal value in a source
graph, the pseudonym it would get under ``hasher``. Pure Catalyst (in
sha256 mode) — one distinct-aggregate over the values.

``depseudonymize``: joins pseudonymized triples back to originals.
IRI pseudonyms are prefix + 64-hex suffix (crypto.rs:49-57), so the
join key is the trailing hex; literal pseudonyms are the whole value.
Unmatched parts pass through unchanged (they were never masked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..crypto import Pseudonymizer
from ..schemas import KIND_IRI, KIND_LITERAL

_HEX64_TAIL = r"([0-9a-f]{64})$"


def build_mapping(triples: DataFrame, hasher: Pseudonymizer) -> DataFrame:
    """(hashed, original) over every distinct IRI/literal value."""
    values = (
        triples.filter(F.col("s_kind") == KIND_IRI).select(F.col("s_value").alias("original"))
        .unionByName(
            triples.filter(F.col("o_kind").isin(KIND_IRI, KIND_LITERAL)).select(
                F.col("o_value").alias("original")
            )
        )
        .distinct()
    )
    return values.select(hasher.hash_expr(F.col("original")).alias("hashed"), "original")


def depseudonymize(pseudo: DataFrame, mapping: DataFrame) -> DataFrame:
    """Invert the rewrite: masked IRIs/literals -> original values."""
    s_tail = F.regexp_extract(F.col("s_value"), _HEX64_TAIL, 1)
    o_tail = F.regexp_extract(F.col("o_value"), _HEX64_TAIL, 1)
    smap = mapping.select(F.col("hashed").alias("_s_hash"), F.col("original").alias("_s_orig"))
    omap = mapping.select(F.col("hashed").alias("_o_hash"), F.col("original").alias("_o_orig"))
    out = (
        pseudo.withColumn("_s_tail", F.when(F.col("s_kind") == KIND_IRI, s_tail))
        .withColumn(
            "_o_tail",
            F.when(F.col("o_kind") == KIND_IRI, o_tail).when(
                F.col("o_kind") == KIND_LITERAL, F.col("o_value")
            ),
        )
        .join(F.broadcast(smap), F.col("_s_tail") == F.col("_s_hash"), "left")
        .join(F.broadcast(omap), F.col("_o_tail") == F.col("_o_hash"), "left")
    )
    return out.select(
        F.col("s_kind"),
        F.coalesce(F.col("_s_orig"), F.col("s_value")).alias("s_value"),
        F.col("predicate"),
        F.col("o_kind"),
        F.coalesce(F.col("_o_orig"), F.col("o_value")).alias("o_value"),
        F.col("o_datatype"),
        F.col("o_lang"),
    )
