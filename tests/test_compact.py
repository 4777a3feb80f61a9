"""Prefix-compacted storage: exact round-trip + size effect."""

from pyspark.sql import functions as F

from tripsu_spark.operators.extract import extract_triples
from tripsu_spark.plans.compact import (
    compact_triples,
    expand_triples,
    expand_triples2,
    maybe_expand,
)
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


def test_level2_round_trip_on_minted_triples(spark):
    triples = extract_triples(synthetic_transcripts(spark, n_convs=30, turns_per_conv=5))
    c = compact_triples(triples, level=2)
    assert _as_set(expand_triples2(c)) == _as_set(triples)
    # every minted predicate is in-dictionary: no fallback strings stored
    row = c.agg(
        F.count(F.when(F.col("p_code") == 0, 1)).alias("fallback_preds"),
        F.count(F.col("o_datatype")).alias("fallback_dts"),
    ).collect()[0]
    assert row["fallback_preds"] == 0
    assert row["fallback_dts"] == 0


def test_level2_round_trip_on_foreign_values(spark):
    """Foreign predicates/datatypes/IRIs take the verbatim fallback
    columns and round-trip exactly."""
    rows = [
        ("iri", "http://other.org/x", "http://other.org/pred", "iri", "http://other.org/y", None, None),
        ("blank", "b0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "iri", "http://example.org/kg/Turn", None, None),
        ("iri", "http://example.org/kg/turn/c/1", "http://example.org/kg/hasText", "literal", "free text", None, "en"),
        ("iri", "http://example.org/kg/conv/c", "http://example.org/kg/ts", "literal", "2024-01-01T00:00:00", "http://www.w3.org/2001/XMLSchema#dateTime", None),
        ("iri", "http://example.org/kg/x", "http://example.org/kg/other", "literal", "7", "http://example.org/kg/customType", None),
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind string, s_value string, predicate string, o_kind string, "
        "o_value string, o_datatype string, o_lang string",
    )
    assert _as_set(expand_triples2(compact_triples(df, level=2))) == _as_set(df)
    assert _as_set(maybe_expand(compact_triples(df, level=2))) == _as_set(df)


def test_level2_passthrough_extra_columns(spark):
    """Non-triple columns (e.g. a precomputed pred_part partition
    column) flow through compaction and expansion untouched."""
    from tripsu_spark.plans.lineage import predicate_partition_col

    triples = extract_triples(
        synthetic_transcripts(spark, n_convs=10, turns_per_conv=3)
    ).withColumn("pred_part", predicate_partition_col())
    c = compact_triples(triples, level=2)
    assert "pred_part" in c.columns
    out = maybe_expand(c)
    assert _as_set(out) == _as_set(triples)


def test_level2_narrower_stored_rows_than_level1(spark):
    """The dict-coded frame stores tinyints where level 1 stores
    strings: kind/predicate/datatype string bytes drop to zero for
    in-vocabulary rows."""
    triples = extract_triples(synthetic_transcripts(spark, n_convs=30, turns_per_conv=5))
    c1 = compact_triples(triples, level=1)
    c2 = compact_triples(triples, level=2)
    b1 = c1.agg(
        F.sum(
            F.length("s_kind") + F.length("predicate") + F.length("o_kind")
            + F.coalesce(F.length("o_datatype"), F.lit(0))
        ).alias("b")
    ).collect()[0]["b"]
    b2 = c2.agg(
        F.sum(
            F.coalesce(F.length("predicate"), F.lit(0))
            + F.coalesce(F.length("o_datatype"), F.lit(0))
        ).alias("b")
    ).collect()[0]["b"]
    assert b2 == 0 and b1 > 0


def test_round_trip_adversarial_values(spark):
    """Battery of boundary values through BOTH storage levels: values
    equal to a known prefix, prefix doubled, dictionary-entry
    near-misses (extra suffix / case change), empty-ish and escaped
    strings, unicode. Exact frame equality required each way."""
    KG = "http://example.org/kg/"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        # s_kind, s_value, predicate, o_kind, o_value, o_datatype, o_lang
        ("iri", KG, KG + "hasText", "literal", KG, None, None),  # value == prefix
        ("iri", KG + KG, RDF + "type", "iri", KG + KG + "x", None, None),  # doubled
        ("iri", KG + "mentionCountX", KG + "mentionCount" + "X", "literal", "9", None, None),  # dict near-miss
        ("iri", KG + "a", KG.upper() + "b", "iri", RDF.upper() + "type", None, None),  # case change = foreign
        ("blank", "", KG + "ts", "literal", "", "", None),  # empty strings
        ("iri", KG + 'q"\\\n\tz', KG + "hasText", "literal", 'esc"\\\npe', None, "en-US"),
        ("iri", KG + "café/中文", KG + "mentions", "iri", KG + "user/ø", None, None),
        ("literal", "not-an-iri-subject", RDF + "typeX", "literal", "v",
         "http://www.w3.org/2001/XMLSchema#dateTimeX", None),  # datatype near-miss
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind string, s_value string, predicate string, o_kind string, "
        "o_value string, o_datatype string, o_lang string",
    )
    for level in (1, 2):
        got = _as_set(maybe_expand(compact_triples(df, level=level)))
        assert got == _as_set(df), f"level {level}"
