"""End-to-end golden test on the REFERENCE fixtures: tests/data/test.nt
+ tests/data/rules.yaml, with a fixed 32-byte secret.

The expected output is computed independently in plain Python from the
reference's documented semantics (SURVEY.md §5 item 2): keyed hash of
masked parts, prefix-preserving IRI rewrite, datatype/lang dropped on
hashed literals. Comparison is an order-insensitive set of parsed
triples (the reference's own output order is a single-thread artifact;
its dual serializer makes byte comparison meaningless, SURVEY.md §1.3).

Precision/recall vs this reference-semantics golden set must be 1.0
(target >= 0.95, BASELINE.json).

Also: round-trip de-pseudonymization — the (hash -> original) mapping
recovered from the run inverts the pseudonymization exactly.
"""

from pathlib import Path
import pytest
from pyspark.sql import functions as F

from tripsu_spark.crypto import Pseudonymizer
from tripsu_spark.operators.index import build_type_index
from tripsu_spark.plans.pipeline import pseudonymize
from tripsu_spark.rules import Rules
from tripsu_spark.sources.ntriples import read_ntriples

SECRET = b"test-secret-0123456789abcdefghij"  # 32 bytes
FIXTURE_NT = str(Path(__file__).parent / "data" / "reference_test.nt")
FIXTURE_RULES = str(Path(__file__).parent / "data" / "reference_rules.yaml")

# Parsed fixture triples (tests/data/test.nt:1-15), as (s, p, o) with
# IRIs bare and literals as ('lit', value).
EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"
SCHEMA = "http://schema.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

FIXTURE = [
    (EX + "Alice", RDF_TYPE, FOAF + "Person"),
    (EX + "Alice", FOAF + "holdsAccount", EX + "Alice-Bank-Account"),
    (EX + "Alice-Bank-Account", RDF_TYPE, "http://xmlns.com/foaf/OnlineAccount"),
    (EX + "Alice-Bank-Account", SCHEMA + "name", ("lit", "my_account32")),
    (EX + "Alice-Bank-Account", SCHEMA + "accessCode", ("lit", "secret-123")),
    (EX + "Alice", SCHEMA + "name", ("lit", "Alice")),
    (EX + "Bob", FOAF + "knows", EX + "Alice"),
    (EX + "Bob", RDF_TYPE, FOAF + "Person"),
    (EX + "Bob", FOAF + "holdsAccount", EX + "Bob-Bank-Account"),
    (EX + "Bob-Bank-Account", RDF_TYPE, "http://xmlns.com/foaf/OnlineAccount"),
    (EX + "Bob-Bank-Account", SCHEMA + "name", ("lit", "my_account12")),
    (EX + "Bob-Bank-Account", SCHEMA + "accessCode", ("lit", "secret-456")),
    (EX + "Bob", SCHEMA + "name", ("lit", "Bob")),
    (EX + "Bank", RDF_TYPE, FOAF + "Organization"),
    (EX + "Bank", SCHEMA + "name", ("lit", "Bank")),
]


def golden_expected(hasher):
    """Apply reference semantics by hand, independent of the engine.

    Rules fixture (tests/data/rules.yaml) expands to:
      of_type           {<http://example.org/Person>,
                         <http://xmlns.com/foaf/0.1/OnlineAccount>}
      on_predicate      {<http://schema.org/accessCode>}
      on_type_predicate {<http://example.org/OnlineAccount>: name,
                         <http://xmlns.com/foaf/0.1/Person>: name}

    Strict matching (rules.rs compares full serializations) means NO
    node rule fires on this data: Alice/Bob are typed
    <http://xmlns.com/foaf/0.1/Person> (not ex:Person) and the account
    nodes are typed <http://xmlns.com/foaf/OnlineAccount> (no `0.1/` —
    not the rule's foaf:OnlineAccount). What IS masked: every
    accessCode literal (on_predicate) and the name literals of
    Alice/Bob (on_type_predicate via foaf:Person). The Bank's name
    stays (Organization has no rule).
    """
    foaf_persons = {EX + "Alice", EX + "Bob"}

    out = set()
    for s, p, o in FIXTURE:
        if isinstance(o, tuple):
            mask_o = (p == SCHEMA + "accessCode") or (
                p == SCHEMA + "name" and s in foaf_persons
            )
            new_o = ("lit", hasher.hash_str(o[1])) if mask_o else o
        else:
            new_o = o
        out.add((s, p, new_o))
    return out


def result_to_set(df):
    out = set()
    for r in df.collect():
        assert r["s_kind"] == "iri"
        o = (
            ("lit", r["o_value"])
            if r["o_kind"] == "literal"
            else r["o_value"]
        )
        out.add((r["s_value"], r["predicate"], o))
    return out


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_golden_e2e_reference_fixture(spark, algorithm):
    hasher = Pseudonymizer.create(algorithm, SECRET)
    rules = Rules.load(FIXTURE_RULES)
    triples = read_ntriples(spark, FIXTURE_NT)
    index_df = build_type_index(triples)
    got = result_to_set(pseudonymize(triples, index_df, rules, hasher))
    expected = golden_expected(hasher)

    tp = len(got & expected)
    precision = tp / len(got)
    recall = tp / len(expected)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall}\nmissing={expected - got}\nextra={got - expected}"
    )
    assert len(got) == 15


NODE_RULES_YAML = """
prefixes:
  foaf: "<http://xmlns.com/foaf/0.1/>"
nodes:
  of_type: ["foaf:Person"]
"""


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_golden_e2e_node_rules_fire(spark, algorithm):
    """Variant where of_type matches the data (foaf:Person): Alice and
    Bob are rewritten wherever they appear as subject OR object, with
    the http://example.org/ prefix preserved (crypto.rs:49-57)."""
    hasher = Pseudonymizer.create(algorithm, SECRET)
    rules = Rules.from_yaml(NODE_RULES_YAML)
    triples = read_ntriples(spark, FIXTURE_NT)
    index_df = build_type_index(triples)
    got = result_to_set(pseudonymize(triples, index_df, rules, hasher))

    persons = {EX + "Alice", EX + "Bob"}

    def hash_iri(iri):
        cut = max(iri.rfind("#"), iri.rfind("/"))
        return iri[: cut + 1] + hasher.hash_str(iri)

    expected = set()
    for s, p, o in FIXTURE:
        new_s = hash_iri(s) if s in persons else s
        new_o = o if isinstance(o, tuple) else (hash_iri(o) if o in persons else o)
        expected.add((new_s, p, new_o))
    assert got == expected
    # prefix preserved on rewritten nodes
    for s, _, _ in got:
        assert s.startswith(EX) or s.startswith("http://")


def test_round_trip_depseudonymization(spark):
    """Keep (hash -> original) pairs from the run; joining them back
    recovers the original values exactly (SURVEY.md §5 item 2)."""
    hasher = Pseudonymizer.create("sha256", SECRET)
    rules = Rules.load(FIXTURE_RULES)
    triples = read_ntriples(spark, FIXTURE_NT)
    index_df = build_type_index(triples)
    out = pseudonymize(triples, index_df, rules, hasher)

    # Build the mapping table from the original values (as a trusted
    # party holding the key would).
    originals = set()
    for s, p, o in FIXTURE:
        originals.add(s if not isinstance(o, tuple) else o[1])
        if not isinstance(o, tuple):
            originals.add(o)
    mapping = {hasher.hash_str(v): v for v in originals}

    recovered = set()
    for r in out.collect():
        for kind, val in (("s", r["s_value"]), ("o", r["o_value"])):
            tail = val.rsplit("/", 1)[-1] if kind == "s" or r["o_kind"] == "iri" else val
            if tail in mapping:
                recovered.add(mapping[tail])
    # Every masked original (the 4 masked literals) is recoverable.
    assert {"Alice", "Bob", "secret-123", "secret-456"} <= recovered
