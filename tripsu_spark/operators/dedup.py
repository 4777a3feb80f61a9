"""Deduplication operators over the ``documents`` table (training-data
pipeline ops; no tripsu counterpart — SURVEY.md graft additions).

All hash primitives are ``md5`` hex strings so Spark and the DuckDB
oracle compute IDENTICAL values (both engines expose md5 as lowercase
hex; min/ordering on hex strings is plain lexicographic ordering).
Each operator's oracle SQL generator lives next to the Spark
implementation to keep them in lock-step.

Scale notes (100 TB): exact dedup is a single hash-aggregate
(map-side partial combine, shuffle on the 32-byte digest, never the
text). MinHash signatures are computed per-row with NO shuffle
(array_min over transform — whole-stage codegen); the LSH band join
shuffles only (band_idx, band_hash, doc_id) tuples, and candidate
verification touches signatures, not documents. The O(n^2) exact
n-gram Jaccard join exists as the small-scale oracle baseline; its
scale path IS the LSH variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ params

SHINGLE_K = 3          # word shingles
NUM_HASHES = 12        # minhash signature length
BAND_SIZE = 2          # rows per LSH band -> 6 bands
EST_JACCARD_MIN = 0.5  # candidate-pair threshold on signature agreement
NGRAM_JACCARD_MIN = 0.3
SIMHASH_BITS = 16


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def _shingles(text: Column) -> Column:
    """Word SHINGLE_K-grams as strings; [] when too short."""
    toks = _tokens(text)
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(SHINGLE_K)]
        ),
    )
    return F.when(n >= SHINGLE_K, make).otherwise(F.array().cast("array<string>"))


def _sql_shingles(text_expr: str) -> str:
    """DuckDB expression mirroring _shingles (1-based list indexing)."""
    toks = f"string_split_regex(lower({text_expr}), '\\s+')"
    parts = " || ' ' || ".join(f"t[i+{off}]" for off in range(SHINGLE_K))
    return (
        f"(SELECT list_transform(range(1, greatest(len(t) - {SHINGLE_K - 1}, 0) + 1), "
        f"i -> {parts}) FROM (SELECT {toks} AS t))"
    )


# ------------------------------------------------------- exact dedup

def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup by md5(text): per digest keep min doc_id + dup count."""
    return (
        documents.select(F.col("doc_id"), F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def dedup_exact_oracle() -> str:
    return (
        "SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_dups FROM documents GROUP BY md5(text)"
    )


# ---------------------------------------------------- minhash + LSH

def minhash_signature(text: Column) -> Column:
    """array<string> of NUM_HASHES minhashes: min over shingles of
    md5('<j>:' || shingle). Lexicographic min over hex == a valid
    min-wise hash family; portable across engines."""
    sh = _shingles(text)

    def minhash_j(j: int):
        # NB: a `lambda s, j=j:` two-parameter lambda would make
        # PySpark pass the ARRAY INDEX as the second argument —
        # capture the seed via a closure instead.
        seed = F.lit(f"{j}:")
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(seed, s))))

    return F.array(*[minhash_j(j) for j in range(NUM_HASHES)])


def _sql_minhash(text_expr: str) -> str:
    sh = _sql_shingles(text_expr)
    mins = ", ".join(
        f"list_min(list_transform({sh}, s -> md5('{j}:' || s)))"
        for j in range(NUM_HASHES)
    )
    return f"[{mins}]"


def minhash_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — LSH bucketing rows."""
    sig = minhash_signature(F.col("text"))
    n_bands = NUM_HASHES // BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(sig, b * BAND_SIZE + r + 1)
                            for r in range(BAND_SIZE)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    # Docs too short to shingle have all-NULL signatures: exclude them
    # (the oracle's NULL || NULL band concat excludes them implicitly).
    return (
        documents.filter(F.size(_shingles(F.col("text"))) > 0)
        .select(F.col("doc_id"), F.explode(bands).alias("b"))
        .select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))
    )


def _sql_bands() -> str:
    """CTE: bands(doc_id, band_idx, band_hash) over documents."""
    n_bands = NUM_HASHES // BAND_SIZE
    rows = []
    for b in range(n_bands):
        parts = " || '|' || ".join(
            f"sig[{b * BAND_SIZE + r + 1}]" for r in range(BAND_SIZE)
        )
        rows.append(
            f"SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_hash FROM sigs"
        )
    return (
        "sigs AS (SELECT doc_id, " + _sql_minhash("text") + " AS sig FROM documents),\n"
        "bands AS (" + " UNION ALL ".join(rows) + ")"
    )


def dedup_minhash_lsh(documents: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: bucket-join on LSH bands, then verify
    on signature agreement >= EST_JACCARD_MIN. Output (a, b, est) with
    a < b, est rounded to avoid cross-engine float noise."""
    sigs = documents.select(
        F.col("doc_id"), minhash_signature(F.col("text")).alias("sig")
    )
    bands = minhash_bands(documents)
    pairs = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band_idx", "band_hash"], how="inner")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    est = (
        F.size(F.filter(F.zip_with(F.col("sa"), F.col("sb"), lambda p, q: p == q), lambda v: v))
        / F.lit(NUM_HASHES)
    )
    return (
        pairs.join(sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sa")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sb")), "b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= EST_JACCARD_MIN)
        .select("a", "b", "est_jaccard")
    )


def dedup_minhash_lsh_oracle() -> str:
    return f"""
WITH {_sql_bands()},
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
)
SELECT p.a, p.b,
  ROUND(len(list_filter(range(1, {NUM_HASHES} + 1),
        i -> sx.sig[i] = sy.sig[i])) / {NUM_HASHES}.0, 6) AS est_jaccard
FROM pairs p
JOIN sigs sx ON sx.doc_id = p.a
JOIN sigs sy ON sy.doc_id = p.b
WHERE len(list_filter(range(1, {NUM_HASHES} + 1),
      i -> sx.sig[i] = sy.sig[i])) / {NUM_HASHES}.0 >= {EST_JACCARD_MIN}
"""


# ------------------------------------------------ exact n-gram Jaccard

def dedup_ngram_jaccard(documents: DataFrame) -> DataFrame:
    """Exact word-3-gram Jaccard >= NGRAM_JACCARD_MIN pairs (a < b).

    O(n^2)-ish verification baseline: explode distinct shingles,
    self-join on shingle, count intersections. The LSH operator above
    is the scale path; this is the ground truth it approximates."""
    sh = documents.select(
        F.col("doc_id"), F.explode(F.array_distinct(_shingles(F.col("text")))).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), on="s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_MIN)
        .select("a", "b", "jaccard")
    )


def dedup_ngram_jaccard_oracle() -> str:
    sh = _sql_shingles("text")
    return f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b,
       ROUND(i.inter / (sa.n + sb.n - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter / (sa.n + sb.n - i.inter) >= {NGRAM_JACCARD_MIN}
"""


# ----------------------------------------- conversation-level dedup

def conversation_text(transcripts: DataFrame) -> DataFrame:
    """(conv_id, text): turns concatenated in turn order — the
    canonical conversation rendering used for conversation dedup."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("text")
        )
    )


def dedup_conversations_exact(transcripts: DataFrame) -> DataFrame:
    """Exact conversation dedup: md5 over the ordered turn rendering;
    keeps the lexicographically-first conv_id per digest."""
    return (
        conversation_text(transcripts)
        .select(F.col("conv_id"), F.md5(F.col("text")).alias("conv_hash"))
        .groupBy("conv_hash")
        .agg(F.min("conv_id").alias("keep_conv"), F.count(F.lit(1)).alias("n_dups"))
    )


def dedup_conversations_exact_oracle(transcripts_cte: str) -> str:
    """Oracle over the shared transcripts CTE (plans/oracle.py)."""
    return f"""
WITH {transcripts_cte.strip()},
conv_text AS (
  SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS text
  FROM transcripts GROUP BY conv_id
)
SELECT md5(text) AS conv_hash, MIN(conv_id) AS keep_conv,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM conv_text GROUP BY md5(text)
"""


# ------------------------------------------------------------ simhash

def _hex_char_val(c: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def simhash(documents: DataFrame) -> DataFrame:
    """SIMHASH_BITS-bit SimHash over word tokens.

    bit_i(doc) = 1 iff sum over tokens of (bit_i(md5(token)) ? 1 : -1)
    > 0, using the first SIMHASH_BITS/4 hex chars of the token md5.
    Emitted as a bit string (e.g. '1010...') — portable everywhere."""
    toks = documents.select(
        F.col("doc_id"), F.explode(_tokens(F.col("text"))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    cols = []
    for i in range(SIMHASH_BITS):
        char_idx = i // 4 + 1  # hex char position, 1-based
        bit_in_char = i % 4
        val = _hex_char_val(F.substring(F.col("h"), char_idx, 1))
        bit = F.floor(val / (2 ** bit_in_char)) % 2
        cols.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{i}"))
    summed = toks.groupBy("doc_id").agg(*cols)
    bitstr = F.concat(
        *[F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(SIMHASH_BITS)]
    )
    return summed.select("doc_id", bitstr.alias("simhash"))


def simhash_oracle() -> str:
    sums = []
    for i in range(SIMHASH_BITS):
        char_idx = i // 4 + 1
        bit_in_char = i % 4
        val = f"(strpos('0123456789abcdef', substr(h, {char_idx}, 1)) - 1)"
        bit = f"(CAST(floor({val} / {2 ** bit_in_char}) AS BIGINT) % 2)"
        sums.append(f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{i}")
    bits = " || ".join(
        f"CASE WHEN s{i} > 0 THEN '1' ELSE '0' END" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, md5(unnest(string_split_regex(lower(text), '\\s+'))) AS h
  FROM documents
),
summed AS (SELECT doc_id, {", ".join(sums)} FROM toks GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM summed
"""
