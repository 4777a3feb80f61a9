"""Pass-1 type index semantics (index.rs:50-135)."""

from pathlib import Path
from pyspark.sql import functions as F

from tripsu_spark.operators.index import build_type_index, type_index_pairs
from tripsu_spark.schemas import TRIPLE_SCHEMA
from tripsu_spark.sources.ntriples import read_ntriples

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_index_multi_type_subject(spark):
    # index.rs:114-135 index_from_iter: multi-type subject keeps both.
    rows = [
        ("iri", "urn:Alice", RDF_TYPE, "iri", "urn:Person", None, None),
        ("iri", "urn:Alice", RDF_TYPE, "iri", "urn:Employee", None, None),
        ("iri", "urn:Alice", RDF_TYPE, "iri", "urn:Person", None, None),  # dup
        ("iri", "urn:Alice", "urn:hasName", "literal", "Alice", None, None),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    [r] = build_type_index(df).collect()
    assert r["subject_key"] == "<urn:Alice>"
    assert sorted(r["types"]) == ["<urn:Employee>", "<urn:Person>"]


def test_index_blank_subjects_indexable(spark):
    rows = [("blank", "b0", RDF_TYPE, "iri", "urn:Person", None, None)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    [r] = build_type_index(df).collect()
    assert r["subject_key"] == "_:b0"


def test_index_on_reference_fixture(spark):
    """tests/data/test.nt has 5 typed subjects over 3 distinct types
    (cf. tests/data/type_index.json: 3 interned types, 5 map keys)."""
    triples = read_ntriples(spark, str(Path(__file__).parent / "data" / "reference_test.nt"))
    assert triples.count() == 15
    idx = build_type_index(triples)
    assert idx.count() == 5
    distinct_types = (
        idx.select(F.explode("types").alias("t")).distinct().count()
    )
    assert distinct_types == 3
    pairs = type_index_pairs(triples)
    assert pairs.count() == 5  # one type each
    got = {
        r["subject_key"]: r["type_iri"] for r in pairs.collect()
    }
    assert got["<http://example.org/Alice>"] == "<http://xmlns.com/foaf/0.1/Person>"
    assert got["<http://example.org/Bank>"] == "<http://xmlns.com/foaf/0.1/Organization>"


def test_index_filter_is_pushed_into_scan(spark, tmp_path):
    """The rdf:type filter must reach the parquet scan (PushedFilters)."""
    rows = [("iri", "urn:Alice", RDF_TYPE, "iri", "urn:Person", None, None)]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    path = str(tmp_path / "triples")
    df.write.parquet(path)
    plan = build_type_index(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert RDF_TYPE in plan
