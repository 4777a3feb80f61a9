"""N-Triples source/sink (O1/O9): parse, escape, round-trip."""

from pathlib import Path
from pyspark.sql import functions as F

from tripsu_spark.schemas import TRIPLE_SCHEMA
from tripsu_spark.sources.ntriples import (
    ntriples_lines,
    parse_ntriples_lines,
    read_ntriples,
    write_ntriples,
)

SAMPLE = [
    '<http://a/s> <http://a/p> <http://a/o> .',
    '_:b0 <http://a/p> _:b1 .',
    '<http://a/s> <http://a/p> "plain" .',
    '<http://a/s> <http://a/p> "tagged"@en .',
    '<http://a/s> <http://a/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',
    '<http://a/s> <http://a/p> "esc \\"quote\\" back\\\\slash\\nnl" .',
    '# a comment line',
    '',
]


def test_parse_forms(spark):
    df = parse_ntriples_lines(spark.createDataFrame([(line,) for line in SAMPLE], ["value"]))
    rows = df.collect()
    assert len(rows) == 6  # comment + blank skipped
    by_obj_kind = {}
    for r in rows:
        by_obj_kind.setdefault(r["o_kind"], []).append(r)
    assert len(by_obj_kind["iri"]) == 1
    assert len(by_obj_kind["blank"]) == 1
    lits = by_obj_kind["literal"]
    assert {r["o_lang"] for r in lits} == {None, "en"}
    assert {r["o_datatype"] for r in lits} == {None, "http://www.w3.org/2001/XMLSchema#int"}
    esc = [r for r in lits if "quote" in r["o_value"]][0]
    assert esc["o_value"] == 'esc "quote" back\\slash\nnl'
    blank = by_obj_kind["blank"][0]
    assert blank["s_kind"] == "blank" and blank["s_value"] == "b0"
    assert blank["o_value"] == "b1"


def test_malformed_lines_are_quarantined_not_dropped(spark):
    lines = spark.createDataFrame(
        [("<http://a/s> <http://a/p> <http://a/o> .",), ("not a triple",)], ["value"]
    )
    df = parse_ntriples_lines(lines)
    assert df.filter(F.col("_error").isNotNull()).count() == 1
    assert df.filter(F.col("_error").isNull()).count() == 1


TRICKY = SAMPLE + [
    'bad line with \\ escape but no triple',
    '<http://a/s> <http://a/p> "unterminated .',
    '<http://a/s> <http://a/p> "" .',                      # empty literal
    '<http://a/s> <http://a/p> ""^^<> .',                  # empty datatype IRI
    '<http://a/s> <http://a/p> "\\u00e9\\U0001F600" .',    # unicode escapes
    '  <http://a/s>   <http://a/p>   "spaced"   .  ',      # whitespace slop
    '<http://a/s> <http://a/p> <http://a/o> no dot',
]


def test_hybrid_parse_identical_to_python_parse(spark):
    """The Catalyst fast path + Python fallback must produce exactly the
    rows the uniform Python parser produces — including _error text —
    on a corpus mixing every form, escapes, and malformed lines."""
    lines = spark.createDataFrame([(line,) for line in TRICKY], ["value"])
    hybrid = {tuple(r) for r in parse_ntriples_lines(lines, hybrid=True).collect()}
    python = {tuple(r) for r in parse_ntriples_lines(lines, hybrid=False).collect()}
    assert hybrid == python


def test_catalyst_fast_path_has_no_python_eval(spark):
    from tripsu_spark.sources.ntriples import parse_ntriples_catalyst

    lines = spark.createDataFrame([(s,) for s in SAMPLE[:3]], ["value"])
    plan = parse_ntriples_catalyst(lines)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_roundtrip_write_read(spark, tmp_path):
    rows = [
        ("iri", "http://a/s", "http://a/p", "literal", 'tricky "v"\n\\x', None, None),
        ("iri", "http://a/s", "http://a/p", "literal", "tagged", None, "en"),
        ("iri", "http://a/s", "http://a/p", "literal", "42", "http://t/int", None),
        ("blank", "b0", "http://a/p", "blank", "b1", None, None),
        ("iri", "http://a/s", "http://a/p", "iri", "http://a/o", None, None),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    path = str(tmp_path / "out.nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_reference_fixture_roundtrip(spark, tmp_path):
    triples = read_ntriples(spark, str(Path(__file__).parent / "data" / "reference_test.nt"))
    path = str(tmp_path / "ref.nt")
    write_ntriples(triples, path)
    again = read_ntriples(spark, path)
    assert {tuple(r) for r in triples.collect()} == {tuple(r) for r in again.collect()}
    # canonical serialization matches the fixture bytes modulo the
    # reference's dual-serializer quirk (here: unmasked path == ours)
    ours = {r["line"] for r in ntriples_lines(triples).collect()}
    theirs = {
        line.strip()
        for line in open(str(Path(__file__).parent / "data" / "reference_test.nt"), encoding="utf-8")
        if line.strip()
    }
    assert ours == theirs
