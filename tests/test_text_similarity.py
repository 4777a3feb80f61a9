"""Text analysis + similarity search operators."""

import math

import pytest
from pyspark.sql import functions as F

from tripsu_spark.operators import multimodal, similarity, text

DOCS = [
    (0, "the cat and the dog of a house", "en", "s", 30),
    (1, "der Hund und die Katze und das Haus", "de", "s", 35),
    (2, "xyzzy plugh qwerty", "zz", "s", 18),
]
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, COLS)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0], 1),  # opposite of 0
        (4, [1.0, 0.0, 0.1, 0.0], 0),   # close to 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_token_count(spark, docs):
    got = {r["doc_id"]: r for r in text.token_count(docs).collect()}
    assert got[0]["n_tokens"] == 8
    assert got[0]["n_distinct"] == 7  # 'the' twice
    assert got[2]["n_tokens"] == 3
    # BPE-ish: ceil(len/4) per token: xyzzy=2, plugh=2, qwerty=2
    assert got[2]["n_bpe"] == 6


def test_quality_score_formula(spark, docs):
    got = {r["doc_id"]: r["quality"] for r in text.quality_score(docs).collect()}
    # doc 0: 8 tokens, 7 distinct, stop hits: the,and,the,of,a = 5
    expected = round(0.4 * 7 / 8 + 0.3 * 5 / 8 + 0.3 * min(8 / 100, 1.0), 6)
    assert got[0] == expected
    assert got[2] < got[0]  # no stopwords -> lower score


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"


def test_doc_fingerprint_order_insensitive(spark):
    rows = [(0, "b a c", "en", "s", 5), (1, "c b a", "en", "s", 5), (2, "a b d", "en", "s", 5)]
    df = spark.createDataFrame(rows, COLS)
    got = {r["doc_id"]: r["fingerprint"] for r in text.doc_fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]


def test_ann_topk_exact(spark, vecs, monkeypatch):
    monkeypatch.setattr(similarity, "N_QUERIES", 1)
    got = [
        (r["neighbor_id"], r["rank"], r["score"])
        for r in similarity.ann_topk(vecs).orderBy("rank").collect()
    ]
    # neighbors of v0 by cosine: v4 (~0.995) > v1 (~0.994) > v2 (0) > v3 (-1)
    assert [g[0] for g in got] == [4, 1, 2, 3]
    assert got[0][2] == round(1.0 / math.sqrt(1.01), 6)
    assert got[2][2] == 0.0 and got[3][2] == -1.0


def test_lsh_bucket_groups_similar_vectors(spark, vecs):
    # tile the 4-dim test vectors up to the operator's DIM=64
    tiled = vecs.withColumn(
        "embedding",
        F.expr(
            f"transform(sequence(1,{similarity.DIM}), i -> element_at(embedding, ((i-1) % 4) + 1))"
        ).cast("array<float>"),
    )
    got = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(tiled).collect()}
    # identical-direction vectors share buckets; opposite vectors differ
    assert got[0] == got[1] == got[4]
    assert got[0] != got[3]
    assert all(len(b) == similarity.N_PLANES for b in got.values())


def test_dedup_embedding_cosine(spark, vecs):
    pairs = {(r["a"], r["b"]) for r in similarity.dedup_embedding_cosine(vecs).collect()}
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    assert (0, 2) not in pairs and (0, 3) not in pairs


def test_ivf_assign_is_shuffle_free(spark, vecs):
    """Round-1 verdict item 6: assignment must be a per-row expression
    over driver-collected literal centroids — no Exchange anywhere in
    the subplan (the old crossJoin+window shuffled k× the rows)."""
    assign = similarity.ivf_assign(vecs)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan and "Join" not in plan
    got = {r["vec_id"]: r["cell"] for r in assign.collect()}
    # every vector is its own nearest centroid (all 5 are centroids here)
    assert got == {i: i for i in range(5)}


def test_ann_topk_ivf_kmeans_shape(spark, vecs):
    out = similarity.ann_topk_ivf_kmeans(vecs).collect()
    assert out, "kmeans IVF returned nothing"
    by_q: dict = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["score"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        scores = [s for _, s in ranks]
        assert scores == sorted(scores, reverse=True)


def test_dedup_embedding_cosine_lsh_recall(spark):
    """The bucketed near-dup must be a high-recall subset of the exact
    all-pairs operator on the driver's own fixture table."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["a"], r["b"]) for r in similarity.dedup_embedding_cosine(emb).collect()}
    lsh = {(r["a"], r["b"]) for r in similarity.dedup_embedding_cosine_lsh(emb).collect()}
    assert lsh <= exact, "LSH emitted a pair the exact operator rejects"
    assert exact, "fixture produced no exact near-dup pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(lsh)}/{len(exact)})"


def test_multimodal_features_plumbing(spark, docs):
    feats = {r["asset_id"]: r for r in multimodal.multimodal_features(docs).collect()}
    assert set(feats) == {0, 1, 2}
    r = feats[0]
    assert r["kind"] == "image" and r["n_bytes"] == len(DOCS[0][1].encode())
    import hashlib

    digest = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert r["checksum"] == digest
    assert r["width"] == (int(digest[0:2], 16) % 64 + 1) * 16
    assert 16 <= r["height"] <= 1024


def _png_bytes(w, h):
    import struct
    import zlib

    chunk = b"IHDR" + struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _jpeg_bytes(w, h):
    import struct

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif_bytes(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")


def test_image_dims_header_parsers():
    dims = multimodal.image_dims
    assert dims(_png_bytes(640, 480)) == (640, 480)
    assert dims(_jpeg_bytes(1024, 768)) == (1024, 768)
    assert dims(_gif_bytes(320, 200)) == (320, 200)
    # progressive JPEG uses SOF2 — still a dims-bearing frame marker
    assert dims(_jpeg_bytes(33, 44).replace(b"\xff\xc0", b"\xff\xc2")) == (33, 44)
    # DHT (0xC4) must NOT be mistaken for an SOF
    assert dims(b"\xff\xd8\xff\xc4\x00\x05\x00\x00\x00\xff\xd9") == (None, None)
    assert dims(b"not an image at all") == (None, None)
    assert dims(_png_bytes(640, 480)[:20]) == (None, None)  # truncated
    assert dims(None) == (None, None)
    assert dims(b"") == (None, None)


def test_multimodal_real_decode_parses_headers(spark):
    """decode='real' extracts true dimensions from PNG/JPEG/GIF payloads
    through the same mapInPandas plumbing; foreign bytes get NULL dims."""
    rows = [
        (1, "image", bytearray(_png_bytes(800, 600)), None),
        (2, "image", bytearray(_jpeg_bytes(640, 360)), None),
        (3, "image", bytearray(_gif_bytes(64, 64)), None),
        (4, "audio", bytearray(b"RIFF....WAVE"), None),
        (5, "image", None, None),
    ]
    assets = spark.createDataFrame(rows, multimodal.ASSET_SCHEMA)
    feats = {
        r["asset_id"]: r
        for r in multimodal.extract_features(assets, decode="real").collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (800, 600)
    assert (feats[2]["width"], feats[2]["height"]) == (640, 360)
    assert (feats[3]["width"], feats[3]["height"]) == (64, 64)
    assert feats[4]["width"] is None and feats[4]["height"] is None
    assert feats[5]["width"] is None and feats[5]["n_bytes"] == 0
    # checksum/n_bytes identical to the fake path (only dims differ)
    import hashlib

    assert feats[1]["checksum"] == hashlib.md5(_png_bytes(800, 600)).hexdigest()
    with pytest.raises(ValueError, match="decode"):
        multimodal.extract_features(assets, decode="bogus")


def test_normalize_text_collapses_cosmetic_variants(spark):
    from tripsu_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "  HELLO\tworld.  "), (4, "different")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["norm_text"] for r in normalize_text(df).collect()}
    assert out[1] == out[2] == out[3] == "hello world"
    assert out[4] == "different"
    # shuffle-free plan
    plan = normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_scrub_pii_adversarial_cross_engine(spark):
    """PII patterns must fire and agree across engines on text that
    actually contains PII (the sf0.01 corpus has none, so its oracle
    row alone would pass vacuously)."""
    import duckdb
    import pandas as pd

    data = [
        (1, "contact alice.smith+spam@ex-ample.co.uk or bob@x.io today"),
        (2, "server at 192.168.001.5 port 8080, call +1 (415) 555-0133"),
        (3, "no pii here, just 42 and v1.2.3 and a@b (not an email)"),
        (4, "mixed: eve@corp.com from 10.0.0.1 dialed 020-7946-0958"),
        # non-PII numerics the phone pattern must NOT touch (round-4
        # advice: the old pattern redacted all of these)
        (5, "released 2026-08-17, pi is 3.14159265, the war of 1914-1918"),
        (6, "order id 12345678 shipped. call 911. 2019 was busy"),
        (7, "versions 1.2.10.4000 build 20260817 at 12:30"),
        # phones that MUST still be caught
        (8, "NANP bare 415-555-0133 and parens (415) 555-0133 ok"),
    ]
    df = spark.createDataFrame(data, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.scrub_pii(df).collect()}
    assert got[1]["n_email"] == 2 and "<EMAIL>" in got[1]["scrubbed"]
    assert "alice" not in got[1]["scrubbed"] and "bob@" not in got[1]["scrubbed"]
    assert got[2]["n_ipv4"] == 1 and got[2]["n_phone"] >= 1
    assert "<IP>" in got[2]["scrubbed"] and "<PHONE>" in got[2]["scrubbed"]
    assert got[3]["n_email"] == 0 and got[3]["n_ipv4"] == 0
    assert got[4]["n_email"] == 1 and got[4]["n_ipv4"] == 1 and got[4]["n_phone"] == 1
    # dates / decimals / ids / build numbers stay intact
    for did in (5, 6, 7):
        assert got[did]["n_phone"] == 0 and got[did]["n_ipv4"] == 0, did
        assert got[did]["scrubbed"] == dict(data)[did], did
    assert got[8]["n_phone"] == 2 and "415" not in got[8]["scrubbed"]
    # cross-engine on the SAME adversarial frame
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(data, columns=["doc_id", "text"]))
    want = {
        int(r[0]): tuple(r)
        for r in con.execute(text.scrub_pii_oracle()).fetchall()
    }
    for did, row in got.items():
        assert want[did] == (
            row["doc_id"], row["scrubbed"], row["n_email"],
            row["n_ipv4"], row["n_phone"],
        ), did


def test_scrub_pii_bare_ten_digit_policy(spark):
    """Pin the documented 10-digit policy (r05 ADVICE item 2): a bare
    EXACTLY-10-digit standalone run matches the NANP shape (all its
    separators are individually optional) and is redacted — intended,
    with 10-digit IDs/unix timestamps as the accepted collateral —
    while bare digit runs of any other length survive untouched."""
    data = [
        (1, "call 4155550133 now"),          # unseparated NANP -> redacted
        (2, "ts 1723900000 logged"),         # 10-digit timestamp -> accepted collateral
        (3, "id 123456789 ok"),              # 9 digits -> untouched
        (4, "card 12345678901 ok"),          # 11 digits -> untouched
        (5, "serial 123456789012 ok"),       # 12 digits -> untouched
    ]
    df = spark.createDataFrame(data, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.scrub_pii(df).collect()}
    assert got[1]["n_phone"] == 1 and "<PHONE>" in got[1]["scrubbed"]
    assert got[2]["n_phone"] == 1 and "<PHONE>" in got[2]["scrubbed"]
    for did in (3, 4, 5):
        assert got[did]["n_phone"] == 0, did
        assert got[did]["scrubbed"] == dict(data)[did], did


def test_repetition_metrics_flags_boilerplate(spark):
    import duckdb
    import pandas as pd

    data = [
        (1, "buy now buy now buy now buy now"),
        (2, "a perfectly ordinary sentence with distinct words"),
        (3, "word"),
        (4, ""),
    ]
    df = spark.createDataFrame(data, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in text.repetition_metrics(df).collect()}
    assert got[1]["dup_bigram_frac"] > 0.5 and got[1]["top_token_frac"] == 0.5
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["dup_bigram_frac"] == 0.0  # single token: no bigrams
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(data, columns=["doc_id", "text"]))
    want = {int(r[0]): (r[1], r[2]) for r in
            con.execute(text.repetition_metrics_oracle()).fetchall()}
    for did, row in got.items():
        w = want[did]
        assert abs(w[0] - row["dup_bigram_frac"]) < 1e-9, did
        assert abs(w[1] - row["top_token_frac"]) < 1e-9, did
