"""Rules config parsing / CURIE expansion — ports of the reference's
rules.rs test groups ``valid_curies`` (rules.rs:391-424) and
``expand_rules`` (rules.rs:425-466), plus io.rs:100-104 fixture load."""

import pytest

from tripsu_spark.rules import PrefixMap, RuleConfigError, Rules

REF_RULES_YAML = """
invert: false
prefixes:
  "": "<http://example.org/>"
  foaf: "<http://xmlns.com/foaf/0.1/>"
nodes:
  of_type:
    - ":Person"
    - "foaf:OnlineAccount"
objects:
  on_predicate:
    - "<http://schema.org/accessCode>"
  on_type_predicate:
    ":OnlineAccount":
      - "<http://schema.org/name>"
    "foaf:Person":
      - "<http://schema.org/name>"
"""


def test_reference_fixture_parses_and_expands():
    rules = Rules.from_yaml(REF_RULES_YAML)
    assert rules.node_of_type == frozenset(
        {"<http://example.org/Person>", "<http://xmlns.com/foaf/0.1/OnlineAccount>"}
    )
    assert rules.object_on_predicate == frozenset({"<http://schema.org/accessCode>"})
    assert rules.object_on_type_predicate == {
        "<http://example.org/OnlineAccount>": frozenset({"<http://schema.org/name>"}),
        "<http://xmlns.com/foaf/0.1/Person>": frozenset({"<http://schema.org/name>"}),
    }
    assert rules.invert is False


# rules.rs:391-424 `valid_curies` — 7 parametrized cases.
@pytest.mark.parametrize(
    "prefix,prefix_uri,rule_type,rule_predicate,ok",
    [
        ("ex", "<http://example.org/>", "ex:Person", "ex:hasName>", True),
        ("ex", "<http://example.org/>", "foaf:Person", "foaf:hasAge>", False),
        ("ex", "<http://example.org/>", "<http:Person>", "<http:hasName>", True),
        ("ex", "http://example.org/", "ex:Person", "ex:hasName>", False),
        ("ex", "<http://example.org/>", "<Person>", "<http:hasName>", False),
        ("ex", "<http://example.org/>", "Person", "<http:hasName>", False),
        ("", "<http://example.org/>", ":Person", "<http:hasName>", True),
    ],
)
def test_valid_curies(prefix, prefix_uri, rule_type, rule_predicate, ok):
    doc = {
        "prefixes": {prefix: prefix_uri},
        "objects": {"on_type_predicate": {rule_type: [rule_predicate]}},
    }
    if ok:
        Rules.from_dict(doc)
    else:
        with pytest.raises(RuleConfigError):
            Rules.from_dict(doc)


# rules.rs:425-466 `expand_rules` — 2 parametrized cases.
@pytest.mark.parametrize(
    "rule_type,rule_predicate",
    [
        ("ex:Person", "ex:hasName"),
        ("<http://example.org/Person>", "<http://example.org/hasName>"),
    ],
)
def test_expand_rules(rule_type, rule_predicate):
    rules = Rules.from_dict(
        {
            "prefixes": {"ex": "<http://example.org/>"},
            "objects": {"on_type_predicate": {rule_type: [rule_predicate]}},
        }
    )
    preds = rules.object_on_type_predicate["<http://example.org/Person>"]
    assert "<http://example.org/hasName>" in preds


def test_default_prefix_missing():
    with pytest.raises(RuleConfigError):
        PrefixMap({"ex": "<http://example.org/>"}).expand(":Person")


def test_underscore_prefix_rejected():
    with pytest.raises(RuleConfigError):
        PrefixMap({"_": "<http://example.org/>"})


def test_empty_rules():
    rules = Rules.from_yaml("{}")
    assert rules.is_empty()
    assert rules.invert is False


def test_loads_reference_fixture_file():
    rules = Rules.load("/root/reference/tests/data/rules.yaml")
    assert "<http://example.org/Person>" in rules.node_of_type
