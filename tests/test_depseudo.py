"""Round-trip de-pseudonymization as a dataframe operator."""

from pathlib import Path
import pytest

from tripsu_spark.crypto import Pseudonymizer
from tripsu_spark.operators.depseudo import build_mapping, depseudonymize
from tripsu_spark.operators.index import build_type_index
from tripsu_spark.plans.pipeline import pseudonymize
from tripsu_spark.rules import Rules
from tripsu_spark.sources.ntriples import read_ntriples

SECRET = b"test-secret-0123456789abcdefghij"
FIXTURE_NT = str(Path(__file__).parent / "data" / "reference_test.nt")
FIXTURE_RULES = str(Path(__file__).parent / "data" / "reference_rules.yaml")


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_round_trip_recovers_masked_values(spark, algorithm):
    hasher = Pseudonymizer.create(algorithm, SECRET)
    rules = Rules.load(FIXTURE_RULES)
    triples = read_ntriples(spark, FIXTURE_NT)
    pseudo = pseudonymize(triples, build_type_index(triples), rules, hasher)
    mapping = build_mapping(triples, hasher)
    recovered = depseudonymize(pseudo, mapping)

    # The reference drops datatype/lang when hashing literals
    # (crypto.rs:60-68) — that loss is irreversible by design, so the
    # round-trip target is (s, p, o-value) equality. Fixture literals
    # are all Simple, so full tuples match here.
    got = {tuple(r) for r in recovered.collect()}
    want = {tuple(r) for r in triples.collect()}
    assert got == want


def test_round_trip_with_node_rules(spark):
    hasher = Pseudonymizer.create("sha256", SECRET)
    rules = Rules.from_yaml(
        'prefixes:\n  foaf: "<http://xmlns.com/foaf/0.1/>"\nnodes:\n  of_type: ["foaf:Person"]\n'
    )
    triples = read_ntriples(spark, FIXTURE_NT)
    pseudo = pseudonymize(triples, build_type_index(triples), rules, hasher)
    # sanity: something actually changed
    assert {tuple(r) for r in pseudo.collect()} != {tuple(r) for r in triples.collect()}
    recovered = depseudonymize(pseudo, build_mapping(triples, hasher))
    assert {tuple(r) for r in recovered.collect()} == {tuple(r) for r in triples.collect()}
