"""Crypto layer — ports of crypto.rs tests (key length, prefix-keeping
IRI hash, quoted-hex literal hash) + BLAKE3 self-test + both backends
through the Spark rewrite path."""

import pytest
from pyspark.sql import functions as F

from tripsu_spark.crypto import (
    Blake3Pseudonymizer,
    Pseudonymizer,
    Sha256Pseudonymizer,
    derive_key,
    pseudo_triple,
)
from tripsu_spark.functions.blake3_py import blake3_hex
from tripsu_spark.schemas import TRIPLE_SCHEMA

SECRET = b"0123456789abcdef0123456789abcdef"  # 32 bytes, fixed for determinism


def test_blake3_empty_vector():
    # Official BLAKE3 test vector for empty input.
    assert (
        blake3_hex(b"")
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )


def test_blake3_keyed_is_deterministic_and_key_sensitive():
    k1, k2 = b"a" * 32, b"b" * 32
    assert blake3_hex(b"hello", k1) == blake3_hex(b"hello", k1)
    assert blake3_hex(b"hello", k1) != blake3_hex(b"hello", k2)
    assert blake3_hex(b"hello", k1) != blake3_hex(b"world", k1)
    assert len(blake3_hex(b"hello", k1)) == 64


def test_blake3_multi_block_and_multi_chunk_paths():
    # exercise >64B (multi-block) and >1024B (multi-chunk, parent tree)
    for n in (0, 1, 63, 64, 65, 1023, 1024, 1025, 3000):
        h = blake3_hex(bytes(range(256)) * ((n // 256) + 1))
        assert len(h) == 64


def test_blake3_batch_matches_scalar_property():
    """The numpy-vectorized batch implementation (the pandas-UDF hot
    path) must be bit-identical to the scalar reference implementation
    at every length class: empty, sub-block, block boundaries, chunk
    boundary, and the multi-chunk fallback."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripsu_spark.functions.blake3_np import blake3_hex_batch

    # deterministic boundary sweep first
    boundary = [b"", b"x", b"y" * 63, b"z" * 64, b"w" * 65, b"q" * 1023,
                b"r" * 1024, b"s" * 1025, b"t" * 2900, None]
    for key in (None, b"k" * 32):
        got = blake3_hex_batch(boundary, key)
        want = [None if d is None else blake3_hex(d, key) for d in boundary]
        assert got == want

    @given(st.lists(st.binary(min_size=0, max_size=1300), max_size=16))
    @settings(max_examples=30, deadline=None)
    def prop(datas):
        key = b"0" * 32
        assert blake3_hex_batch(datas, key) == [blake3_hex(d, key) for d in datas]

    prop()


def test_derive_key_semantics():
    # crypto.rs:98-102: short secret rejected; crypto.rs:104-110:
    # key = blake3(secret)[0..32].
    with pytest.raises(ValueError):
        derive_key(b"short")
    key = derive_key(SECRET)
    assert len(key) == 32
    assert key.hex() == blake3_hex(SECRET)
    # no secret -> random 32 bytes
    assert len(derive_key(None)) == 32
    assert derive_key(None) != derive_key(None)


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_hash_str_matches_hash_expr(spark, algorithm):
    hasher = Pseudonymizer.create(algorithm, SECRET)
    df = spark.createDataFrame([("hello",), ("wörld",)], ["v"])
    got = [r[0] for r in df.select(hasher.hash_expr(F.col("v"))).collect()]
    assert got == [hasher.hash_str("hello"), hasher.hash_str("wörld")]


def _rewrite(spark, hasher, rows, mask_s, mask_o):
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = pseudo_triple(df, F.lit(mask_s), F.lit(mask_o), hasher)
    return out.collect()


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_pseudo_named_node_keeps_prefix(spark, algorithm):
    # crypto.rs:49-57 + crypto.rs:138-149 test: prefix kept, suffix hex.
    hasher = Pseudonymizer.create(algorithm, SECRET)
    rows = [("iri", "http://example.com/tripsu", "p:x", "literal", "v", None, None)]
    [r] = _rewrite(spark, hasher, rows, True, False)
    assert r["s_value"] == "http://example.com/" + hasher.hash_str(
        "http://example.com/tripsu"
    )
    suffix = r["s_value"].removeprefix("http://example.com/")
    assert all(c in "0123456789abcdef" for c in suffix)


def test_pseudo_iri_hash_covers_full_iri_not_suffix(spark):
    """The hash input is the FULL IRI (crypto.rs:53 hashes t.iri), not
    the local name — two IRIs with equal local names differ."""
    hasher = Sha256Pseudonymizer(derive_key(SECRET))
    rows = [
        ("iri", "http://a.org/x", "p:x", "literal", "v", None, None),
        ("iri", "http://b.org/x", "p:x", "literal", "v", None, None),
    ]
    r1, r2 = _rewrite(spark, hasher, rows, True, False)
    assert r1["s_value"].split("/")[-1] != r2["s_value"].split("/")[-1]


def test_pseudo_iri_without_separator_uses_empty_prefix(spark):
    """Documented divergence: reference panics on 'urn:x' (crypto.rs:51
    rfind().unwrap()); we hash the whole IRI with an empty prefix."""
    hasher = Sha256Pseudonymizer(derive_key(SECRET))
    rows = [("iri", "urn:x", "p:x", "literal", "v", None, None)]
    [r] = _rewrite(spark, hasher, rows, True, False)
    assert r["s_value"] == hasher.hash_str("urn:x")


@pytest.mark.parametrize("algorithm", ["sha256", "blake3"])
def test_pseudo_literal_drops_datatype_and_lang(spark, algorithm):
    # crypto.rs:60-68: hashed literals become Simple literals.
    hasher = Pseudonymizer.create(algorithm, SECRET)
    rows = [
        ("iri", "urn:s", "p:x", "literal", "42", "http://www.w3.org/2001/XMLSchema#int", None),
        ("iri", "urn:s", "p:x", "literal", "hi", None, "en"),
        ("iri", "urn:s", "p:x", "literal", "plain", None, None),
    ]
    out = _rewrite(spark, hasher, rows, False, True)
    for r, orig in zip(out, ["42", "hi", "plain"]):
        assert r["o_value"] == hasher.hash_str(orig)
        assert r["o_datatype"] is None and r["o_lang"] is None


def test_pseudo_blank_nodes_unchanged_even_when_masked(spark):
    # crypto.rs:71-73 — reachable via invert.
    hasher = Sha256Pseudonymizer(derive_key(SECRET))
    rows = [("blank", "b0", "p:x", "blank", "b1", None, None)]
    [r] = _rewrite(spark, hasher, rows, True, True)
    assert r["s_value"] == "b0" and r["o_value"] == "b1"


def test_unmasked_parts_verbatim(spark):
    hasher = Sha256Pseudonymizer(derive_key(SECRET))
    rows = [("iri", "http://a/x", "p:x", "literal", "keep", "dt:x", None)]
    [r] = _rewrite(spark, hasher, rows, False, False)
    assert tuple(r) == rows[0]
