"""Pass 1 — type index build (O2+O3+O4; reference src/index.rs).

``tripsu index``: keep only rdf:type triples (index.rs:86), aggregate a
deduped set of serialized type terms per serialized subject term
(index.rs:50-93). In Spark this is a filter (pushed into the scan by
Catalyst) + hash aggregate with map-side partial combine:

    triples.filter(predicate == rdf:type)
           .groupBy(subject_key)
           .agg(collect_set(object_serialization))

The reference's u64-hashed keys and string interning (index.rs:21-31)
are memory tricks of its in-process HashMap, not semantics; Spark gets
dictionary encoding from Parquet/Tungsten for free (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import RDF_TYPE
from ..functions.terms import serialize_object, subject_key


def build_type_index(triples: DataFrame) -> DataFrame:
    """triples -> (subject_key: string, types: array<string>).

    Both columns hold full term serializations ('<iri>' / '_:id'),
    matching the reference's index keying (index.rs:87: it inserts
    ``subject.to_string() -> object.to_string()``).
    """
    return (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select(
            subject_key().alias("subject_key"),
            serialize_object(
                F.col("o_kind"), F.col("o_value"), F.col("o_datatype"), F.col("o_lang")
            ).alias("type_iri"),
        )
        .groupBy("subject_key")
        .agg(F.collect_set("type_iri").alias("types"))
    )


def type_index_pairs(triples: DataFrame) -> DataFrame:
    """Exploded (subject_key, type_iri) distinct pairs — the
    oracle-friendly flat view of the index (arrays hash differently
    across engines; pairs do not)."""
    return (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select(
            subject_key().alias("subject_key"),
            serialize_object(
                F.col("o_kind"), F.col("o_value"), F.col("o_datatype"), F.col("o_lang")
            ).alias("type_iri"),
        )
        .distinct()
    )
