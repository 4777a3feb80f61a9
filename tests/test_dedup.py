"""Dedup operators: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from tripsu_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
    (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat", "en", "s", 43),  # near dup
    (3, "completely different text about spark engines and shuffles", "en", "s", 59),
    (4, "tiny", "en", "s", 4),  # shorter than a shingle
]
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, COLS)


def test_dedup_exact(spark, docs):
    rows = {r["text_hash"]: r for r in dedup.dedup_exact(docs).collect()}
    assert len(rows) == 4  # 5 docs, one exact dup pair
    dup = [r for r in rows.values() if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_minhash_signature_properties(spark, docs):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", dedup.minhash_signature(F.col("text")).alias("sig")).collect()
    }
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    assert len(sigs[0]) == dedup.NUM_HASHES
    # near-dup shares most minhashes; unrelated shares few
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3]))
    assert agree_near > agree_far
    # too-short doc -> all-null signature, and never a candidate
    assert all(v is None for v in sigs[4])


def test_dedup_minhash_lsh_finds_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in dedup.dedup_minhash_lsh(docs).collect()}
    assert pairs[(0, 1)] == 1.0
    assert all(a < b for a, b in pairs)
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_dedup_ngram_jaccard_exact_values(spark, docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in dedup.dedup_ngram_jaccard(docs).collect()}
    assert got[(0, 1)] == 1.0
    # docs 0 and 2: 7 shingles each, 6 shared -> 6/8 = 0.75
    assert got[(0, 2)] == 0.75
    assert (0, 3) not in got


def test_simhash_shape_and_similarity(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert all(len(v) == dedup.SIMHASH_BITS and set(v) <= {"0", "1"} for v in got.values())
    assert got[0] == got[1]
    ham = lambda x, y: sum(a != b for a, b in zip(x, y))  # noqa: E731
    assert ham(got[0], got[2]) <= ham(got[0], got[3])
