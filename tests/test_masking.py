"""Mask-column truth tables — ports of the reference's rule-matching
tests (rules.rs:284-390): type_rule x3, predicate_rule x2,
type_predicate_rule x4, and the canonical individual_triple x5, plus
the blank-node asymmetry and invert semantics called out in
SURVEY.md §7 hard parts (b)/(c)."""

import pytest
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from tripsu_spark.operators.masking import apply_masks
from tripsu_spark.rules import Rules
from tripsu_spark.schemas import TRIPLE_SCHEMA

INDEX_SCHEMA = StructType(
    [
        StructField("subject_key", StringType(), False),
        StructField("types", ArrayType(StringType()), False),
    ]
)


def make_triples(spark, rows):
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def make_index(spark, mapping):
    return spark.createDataFrame(
        [(k, list(v)) for k, v in mapping.items()], INDEX_SCHEMA
    )


def masks(spark, triple_rows, index_map, rules_doc):
    df = apply_masks(
        make_triples(spark, triple_rows),
        make_index(spark, index_map),
        Rules.from_dict(rules_doc),
    )
    return [(r["mask_subject"], r["mask_object"]) for r in df.collect()]


IRI = "iri"
LIT = "literal"
BLANK = "blank"


# rules.rs:284-305 type_rule (subject node-rule matching via index)
@pytest.mark.parametrize(
    "index_map,rule_type,expected",
    [
        ({"<urn:Alice>": ["<urn:Person>"]}, "<urn:Person>", True),
        ({"<urn:Alice>": ["<urn:Person>"]}, "<urn:Bank>", False),
        ({"<urn:BankName>": ["<urn:Bank>"]}, "<urn:Bank>", False),
    ],
)
def test_type_rule(spark, index_map, rule_type, expected):
    rows = [(IRI, "urn:Alice", "urn:hasName", LIT, "x", None, None)]
    doc = {"nodes": {"of_type": [rule_type]}}
    assert masks(spark, rows, index_map, doc) == [(expected, False)]


# rules.rs:307-321 predicate_rule
@pytest.mark.parametrize(
    "rule_predicate,expected",
    [("<urn:hasName>", True), ("<urn:hasAge>", False)],
)
def test_predicate_rule(spark, rule_predicate, expected):
    rows = [(IRI, "urn:Alice", "urn:hasName", LIT, "x", None, None)]
    doc = {"objects": {"on_predicate": [rule_predicate]}}
    assert masks(spark, rows, {}, doc) == [(False, expected)]


# rules.rs:323-351 type_predicate_rule
@pytest.mark.parametrize(
    "rule_type,rule_predicate,index_map,expected",
    [
        ("<urn:Person>", "<urn:hasName>", {"<urn:Alice>": ["<urn:Person>"]}, True),
        ("<urn:Person>", "<urn:hasAge>", {"<urn:Alice>": ["<urn:Person>"]}, False),
        ("<urn:Bob>", "<urn:hasAge>", {"<urn:Alice>": ["<urn:Person>"]}, False),
        ("<urn:Bob>", "<urn:hasAge>", {"<urn:Bob>": ["<urn:Person>"]}, False),
    ],
)
def test_type_predicate_rule(spark, rule_type, rule_predicate, index_map, expected):
    rows = [(IRI, "urn:Alice", "urn:hasName", LIT, "x", None, None)]
    doc = {"objects": {"on_type_predicate": {rule_type: [rule_predicate]}}}
    assert masks(spark, rows, index_map, doc) == [(False, expected)]


# rules.rs:353-390 individual_triple — the canonical truth table.
INDIVIDUAL_RULES = {
    "nodes": {"of_type": ["<urn:Person>"]},
    "objects": {
        "on_predicate": ["<urn:hasLastName>"],
        "on_type_predicate": {"<urn:Person>": ["<urn:hasAge>"]},
    },
}
INDIVIDUAL_INDEX = {
    "<urn:Alice>": ["<urn:Person>"],
    "<urn:Bob>": ["<urn:Person>"],
    "<urn:ACME>": ["<urn:Organization>"],
}


@pytest.mark.parametrize(
    "row,expected",
    [
        # sensitive subject, on-type sensitive object -> 0b101
        ((IRI, "urn:Alice", "urn:hasAge", LIT, "42", None, None), (True, True)),
        # sensitive subject, sensitive literal object -> 0b101
        ((IRI, "urn:Alice", "urn:hasLastName", LIT, "Foobar", None, None), (True, True)),
        # sensitive subject, sensitive named node object -> 0b101
        ((IRI, "urn:Alice", "urn:hasFriend", IRI, "urn:Bob", None, None), (True, True)),
        # non-sensitive subject, sensitive named node object -> 0b001
        ((IRI, "urn:ACME", "urn:hasEmployee", IRI, "urn:Bob", None, None), (False, True)),
        # non-sensitive subject, non-sensitive object -> 0b000
        ((IRI, "urn:ACME", "urn:hasAge", LIT, "200", None, None), (False, False)),
    ],
)
def test_individual_triple(spark, row, expected):
    assert masks(spark, [row], INDIVIDUAL_INDEX, INDIVIDUAL_RULES) == [expected]


def test_blank_subject_never_node_masked_but_type_predicate_matches(spark):
    """rules.rs:169 (blank subject -> no node rule) vs rules.rs:203-208
    (blank subject DOES match on_type_predicate via its indexed type)."""
    rows = [(BLANK, "b0", "urn:hasAge", LIT, "42", None, None)]
    index_map = {"_:b0": ["<urn:Person>"]}
    doc = {
        "nodes": {"of_type": ["<urn:Person>"]},
        "objects": {"on_type_predicate": {"<urn:Person>": ["<urn:hasAge>"]}},
    }
    assert masks(spark, rows, index_map, doc) == [(False, True)]


def test_blank_object_never_node_masked(spark):
    rows = [(IRI, "urn:Alice", "urn:knows", BLANK, "b1", None, None)]
    index_map = {"_:b1": ["<urn:Person>"], "<urn:Alice>": ["<urn:Person>"]}
    doc = {"nodes": {"of_type": ["<urn:Person>"]}}
    assert masks(spark, rows, index_map, doc) == [(True, False)]


def test_invert_flips_both_masks(spark):
    rows = [
        (IRI, "urn:Alice", "urn:hasAge", LIT, "42", None, None),
        (IRI, "urn:ACME", "urn:hasAge", LIT, "200", None, None),
    ]
    doc = dict(INDIVIDUAL_RULES, invert=True)
    got = masks(spark, rows, INDIVIDUAL_INDEX, doc)
    assert sorted(got) == sorted([(False, False), (True, True)])


def test_multi_type_subject_any_match(spark):
    """rules.rs:222/244-250 — any of the subject's types matching is enough."""
    rows = [(IRI, "urn:Alice", "urn:hasName", LIT, "x", None, None)]
    index_map = {"<urn:Alice>": ["<urn:Employee>", "<urn:Person>"]}
    doc = {"nodes": {"of_type": ["<urn:Person>"]}}
    assert masks(spark, rows, index_map, doc) == [(True, False)]
