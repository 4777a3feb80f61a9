"""Rules config parsing / CURIE expansion — ports of the reference's
rules.rs test groups ``valid_curies`` (rules.rs:391-424) and
``expand_rules`` (rules.rs:425-466), plus io.rs:100-104 fixture load."""

from pathlib import Path
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
    rules = Rules.load(str(Path(__file__).parent / "data" / "reference_rules.yaml"))
    assert "<http://example.org/Person>" in rules.node_of_type


# --- RFC 3987 fail-fast parity (reference uris.rs:47-50 via sophia_iri) ---

VALID_IRIS = [
    "http://example.org/",
    "http://example.org",
    "http://example.org/Person#x",
    "urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66",
    "a:b",
    "scheme:",
    "http://user:pw@host:8080/p?q=1#f",
    "http://127.0.0.1/",
    "http://[2001:db8::1]/x",
    "http://[::1]:80/",
    "http://例え.jp/パス",
    "mailto:x@y.org",
    "file:///tmp/x",
    "http://example.org/a%20b",
    "ftp://ftp.is.co.za/rfc/rfc1808.txt",
]

INVALID_IRIS = [
    "",
    "http://exa mple.org/",
    "1http://x",
    "://missing",
    "http",
    "http://example.org/<>",
    "http://example.org/\\",
    "http://%zz/",
    "http://[not-ipv6]/",
    "ht tp://x",
    "http://example.org/{}",
    "http://example.org/a b",
    'http://example.org/"q"',
    "http://example.org/^",
    "http://example.org/|a",
]


@pytest.mark.parametrize("iri", VALID_IRIS)
def test_valid_full_iri_accepted(iri):
    rules = Rules.from_dict({"nodes": {"of_type": [f"<{iri}>"]}})
    assert f"<{iri}>" in rules.node_of_type


@pytest.mark.parametrize("iri", INVALID_IRIS)
def test_invalid_full_iri_fails_fast(iri):
    """The reference panics at config load on any RFC 3987 violation
    (io.rs:46-55); we must reject the same strings at load time."""
    with pytest.raises(RuleConfigError):
        Rules.from_dict({"nodes": {"of_type": [f"<{iri}>"]}})


@pytest.mark.parametrize("iri", INVALID_IRIS)
def test_invalid_prefix_iri_fails_fast(iri):
    with pytest.raises(RuleConfigError):
        PrefixMap({"ex": f"<{iri}>"})
