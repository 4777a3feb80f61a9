"""Prefix-compacted storage: exact round-trip + size effect."""

from pyspark.sql import functions as F

from tripsu_spark.operators.extract import extract_triples
from tripsu_spark.plans.compact import compact_triples, expand_triples
from tripsu_spark.sources.transcripts import synthetic_transcripts


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_round_trip_on_minted_triples(spark):
    triples = extract_triples(synthetic_transcripts(spark, n_convs=30, turns_per_conv=5))
    assert _as_set(expand_triples(compact_triples(triples))) == _as_set(triples)


def test_round_trip_on_foreign_iris(spark):
    """Values with no known prefix (external .nt inputs, blanks,
    literals) must pass through verbatim."""
    rows = [
        ("iri", "http://other.org/x", "http://other.org/p", "iri", "http://other.org/y", None, None),
        ("blank", "b0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "iri", "http://example.org/kg/Turn", None, None),
        ("iri", "http://example.org/kg/turn/c/1", "http://example.org/kg/hasText", "literal", "free text, not an IRI", None, "en"),
        ("iri", "http://example.org/kg/conv/c", "http://example.org/kg/ts", "literal", "2024-01-01T00:00:00", "http://www.w3.org/2001/XMLSchema#dateTime", None),
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind string, s_value string, predicate string, o_kind string, "
        "o_value string, o_datatype string, o_lang string",
    )
    assert _as_set(expand_triples(compact_triples(df))) == _as_set(df)


def test_compaction_actually_shrinks_minted_values(spark):
    triples = extract_triples(synthetic_transcripts(spark, n_convs=30, turns_per_conv=5))
    c = compact_triples(triples)
    row = c.agg(
        F.avg(F.length("s_value")).alias("sc"),
        F.avg(F.length("predicate")).alias("pc"),
    ).collect()[0]
    orig = triples.agg(
        F.avg(F.length("s_value")).alias("so"),
        F.avg(F.length("predicate")).alias("po"),
    ).collect()[0]
    assert row["sc"] < orig["so"] - 15
    assert row["pc"] < orig["po"] - 15
