"""Interop with the reference's JSON type index (io.rs:58-63) and the
stdin/stdout CLI modes (io.rs:24-37).

The SipHash-1-3 implementation is validated against the COMMITTED
reference fixture: every subject in tests/data/test.nt must hash to a
key present in tests/data/type_index.json with the right types — the
fixture was produced by the reference binary itself, so matching it is
matching Rust's DefaultHasher bit-for-bit.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from tripsu_spark.crypto import Pseudonymizer
from tripsu_spark.functions.siphash13 import as_i64, rust_default_hash_str, siphash13
from tripsu_spark.operators.index import build_type_index
from tripsu_spark.plans.pipeline import pseudonymize
from tripsu_spark.rules import Rules
from tripsu_spark.sources.ntriples import read_ntriples
from tripsu_spark.sources.type_index_json import load_type_index_json, rust_hash_key

from test_e2e_golden import (
    FIXTURE_NT,
    FIXTURE_RULES,
    NODE_RULES_YAML,
    SECRET,
    golden_expected,
    result_to_set,
)

# Committed copy of the fixture the reference binary itself ships at
# tests/data/type_index.json (produced by `tripsu index` over its test
# .nt input) — copied verbatim so the interop tests run without the
# external reference checkout present.
FIXTURE_INDEX_JSON = str(Path(__file__).parent / "data" / "reference_type_index.json")

TYPED_SUBJECTS = {
    "<http://example.org/Alice>": ["<http://xmlns.com/foaf/0.1/Person>"],
    "<http://example.org/Alice-Bank-Account>": ["<http://xmlns.com/foaf/OnlineAccount>"],
    "<http://example.org/Bob>": ["<http://xmlns.com/foaf/0.1/Person>"],
    "<http://example.org/Bob-Bank-Account>": ["<http://xmlns.com/foaf/OnlineAccount>"],
    "<http://example.org/Bank>": ["<http://xmlns.com/foaf/0.1/Organization>"],
}


def test_rust_default_hash_matches_reference_fixture():
    raw = json.loads(Path(FIXTURE_INDEX_JSON).read_text())
    for subject, types in TYPED_SUBJECTS.items():
        key = str(rust_default_hash_str(subject))
        assert key in raw["map"], f"{subject} missing from reference index"
        got = [raw["types"][i] for i in raw["map"][key]]
        assert got == types


def test_siphash13_empty_and_block_boundaries():
    # the function must be well-defined at every length mod 8
    seen = {siphash13(b"x" * n) for n in range(0, 17)}
    assert len(seen) == 17  # all distinct, no crashes


def test_as_i64_roundtrip():
    assert as_i64(0) == 0
    assert as_i64(2**63 - 1) == 2**63 - 1
    assert as_i64(2**63) == -(2**63)
    assert as_i64(2**64 - 1) == -1


def test_load_type_index_json(spark):
    idx = load_type_index_json(spark, FIXTURE_INDEX_JSON)
    rows = {r["subject_key"]: sorted(r["types"]) for r in idx.collect()}
    assert len(rows) == 5
    key = as_i64(rust_default_hash_str("<http://example.org/Alice>"))
    assert rows[key] == ["<http://xmlns.com/foaf/0.1/Person>"]


@pytest.mark.parametrize("rules_src", ["fixture", "node"])
def test_pseudo_via_json_index_matches_native_index(spark, rules_src):
    """pseudonymize() fed the reference's OWN index.json (joined on
    recomputed SipHash keys) must emit exactly what the natively built
    index emits — including the node-rule variant where index lookups
    actually drive the masking."""
    hasher = Pseudonymizer.create("sha256", SECRET)
    rules = (
        Rules.load(FIXTURE_RULES)
        if rules_src == "fixture"
        else Rules.from_yaml(NODE_RULES_YAML)
    )
    triples = read_ntriples(spark, FIXTURE_NT)

    native = result_to_set(
        pseudonymize(triples, build_type_index(triples), rules, hasher)
    )
    via_json = result_to_set(
        pseudonymize(
            triples,
            load_type_index_json(spark, FIXTURE_INDEX_JSON),
            rules,
            hasher,
            key_fn=rust_hash_key,
        )
    )
    assert via_json == native
    if rules_src == "fixture":
        assert via_json == golden_expected(hasher)


def test_cli_stdin_stdout_golden(tmp_path):
    """`cat test.nt | tripsu_cli pseudo - ... -o -` (reference io.rs
    stdin/stdout defaults) must emit the golden triples on stdout."""
    secret_file = tmp_path / "secret.bin"
    secret_file.write_bytes(SECRET)
    proc = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "jobs" / "tripsu_cli.py"),
            "pseudo",
            "-",
            "-x",
            FIXTURE_INDEX_JSON,
            "-r",
            FIXTURE_RULES,
            "-s",
            str(secret_file),
            "-o",
            "-",
        ],
        stdin=open(FIXTURE_NT, "rb"),
        capture_output=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    lines = sorted(ln for ln in proc.stdout.decode().splitlines() if ln.strip())
    assert len(lines) == 15
    hasher = Pseudonymizer.create("sha256", SECRET)
    # golden set, serialized the canonical way: every masked literal is
    # the keyed hash; spot-check one known rewrite end-to-end
    expected_alice_name = hasher.hash_str("Alice")
    assert any(
        ln == f'<http://example.org/Alice> <http://schema.org/name> "{expected_alice_name}" .'
        for ln in lines
    ), lines[:5]


def test_dump_type_index_json_matches_reference_fixture(spark):
    """Writing the JSON index from the fixture .nt must reproduce the
    reference binary's committed type_index.json structurally: same
    hash keys, same type set per key (type interning order is the only
    legitimate difference, so compare after dereference)."""
    from tripsu_spark.sources.type_index_json import dump_type_index_json

    triples = read_ntriples(spark, FIXTURE_NT)
    ours = json.loads(dump_type_index_json(build_type_index(triples)))
    ref = json.loads(Path(FIXTURE_INDEX_JSON).read_text())

    def deref(doc):
        return {
            k: sorted(doc["types"][i] for i in idxs) for k, idxs in doc["map"].items()
        }

    assert deref(ours) == deref(ref)
    # our index must also round-trip through our own loader
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        fh.write(json.dumps(ours))
        path = fh.name
    loaded = load_type_index_json(spark, path)
    assert loaded.count() == 5
