"""Similarity search over the ``embeddings`` table
(vec_id, embedding array<float>, label).

- brute-force cosine top-k: the correctness baseline. Dot products are
  pure Catalyst (``aggregate(zip_with(...))`` — codegen, no UDF); the
  k-NN selection is a window rank partitioned by query id.
- LSH (random hyperplane) bucketing: the scale path. Hyperplanes are
  derived deterministically from md5 on the DRIVER (plain Python) and
  embedded as literal arrays, so Spark and the DuckDB oracle use
  byte-identical planes. At 100 TB the bucket column turns the O(n^2)
  cross join into a per-bucket join (and is a natural partition key
  for the vector table).

Floats: embeddings are float32 cast to float64 in BOTH engines and
summed in identical (sequential fold) order, so scores are reproducible
bit-for-bit; emitted scores are rounded to 6 dp anyway, and rank
tiebreaks are on neighbor id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8
TOP_K = 5
N_QUERIES = 10          # queries = vec_id < N_QUERIES
# "near" is relative to the corpus: these are synthetic random-ish
# 64-dim vectors where top-1 cosine ~0.35; real embedding dedup would
# use ~0.95+. The operator is identical either way.
NEAR_DUP_COSINE = 0.35


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _emb(col: str = "embedding") -> Column:
    return F.col(col).cast("array<double>")


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic +-1 hyperplanes from md5("<p>:<i>") parity."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) < 8 else -1)
        planes.append(row)
    return planes


# ------------------------------------------------- brute-force top-k

def ann_topk(embeddings: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, rank, score) — exact cosine top-K for
    the first N_QUERIES vectors against the full table."""
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _emb().alias("q")
    )
    cands = embeddings.select(F.col("vec_id").alias("neighbor_id"), _emb().alias("v"))
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _sql_dot(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def ann_topk_oracle() -> str:
    dot = _sql_dot("q.embedding", "c.embedding")
    nq = _sql_dot("q.embedding", "q.embedding")
    nc = _sql_dot("c.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS score
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= {TOP_K}
"""


# ------------------------------------------------------ LSH buckets

def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """(vec_id, bucket) — sign bits of N_PLANES hyperplane projections."""
    planes = hyperplanes()
    bits = [
        F.when(
            _dot(_emb(), F.array(*[F.lit(float(x)) for x in plane])) > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return embeddings.select(F.col("vec_id"), F.concat(*bits).alias("bucket"))


def lsh_buckets_oracle() -> str:
    planes = hyperplanes()
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(f"{float(x)}" for x in plane) + "]"
        dot = _sql_dot("embedding", arr)
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    return f"SELECT vec_id, {' || '.join(bits)} AS bucket FROM embeddings"


def ann_topk_lsh(embeddings: DataFrame) -> DataFrame:
    """Bucketed ANN: exact cosine rank restricted to same-bucket
    candidates — the join that scales (shuffle on bucket, not O(n^2))."""
    b = lsh_buckets(embeddings)
    withb = embeddings.join(b, "vec_id").select(
        F.col("vec_id"), _emb().alias("v"), F.col("bucket")
    )
    queries = withb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket")
    )
    scored = (
        queries.join(
            withb.select(F.col("vec_id").alias("neighbor_id"), "v", "bucket"),
            on="bucket",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ann_topk_lsh_oracle() -> str:
    planes = hyperplanes()
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(f"{float(x)}" for x in plane) + "]"
        dot = _sql_dot("embedding", arr)
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    bucket = " || ".join(bits)
    dot = _sql_dot("q.embedding", "c.embedding")
    nq = _sql_dot("q.embedding", "q.embedding")
    nc = _sql_dot("c.embedding", "c.embedding")
    return f"""
WITH withb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS score
  FROM withb q JOIN withb c ON q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= {TOP_K}
"""


# ------------------------------------------------------ IVF buckets

N_CENTROIDS = 16


def ivf_assign(embeddings: DataFrame) -> DataFrame:
    """(vec_id, cell) — inverted-file assignment: nearest centroid by
    cosine, centroids = the first N_CENTROIDS vectors (deterministic
    seed set; a production build would k-means these, the partitioning
    machinery is identical). Ties break on lowest centroid id."""
    cents = embeddings.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cell"), _emb().alias("c")
    )
    scored = (
        embeddings.select(F.col("vec_id"), _emb().alias("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("score", F.round(cosine(F.col("v"), F.col("c")), 6))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("cell").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def ann_topk_ivf(embeddings: DataFrame) -> DataFrame:
    """Bucketed ANN, IVF flavor: exact cosine rank restricted to the
    query's cell (nprobe=1). The cell column is the natural partition
    key for the vector table at scale."""
    assign = ivf_assign(embeddings)
    withc = embeddings.join(assign, "vec_id").select(
        F.col("vec_id"), _emb().alias("v"), F.col("cell")
    )
    queries = withc.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("cell")
    )
    scored = (
        queries.join(
            withc.select(F.col("vec_id").alias("neighbor_id"), "v", "cell"), on="cell"
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _sql_ivf_assign() -> str:
    dot = _sql_dot("e.embedding", "c.embedding")
    ne = _sql_dot("e.embedding", "e.embedding")
    nc = _sql_dot("c.embedding", "c.embedding")
    return f"""
cents AS (SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < {N_CENTROIDS}),
cscored AS (
  SELECT e.vec_id, c.cell,
         ROUND({dot} / (sqrt({ne}) * sqrt({nc})), 6) AS score
  FROM embeddings e, cents c
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell ASC) AS rn
    FROM cscored
  ) WHERE rn = 1
)
"""


def ivf_assign_oracle() -> str:
    return "WITH " + _sql_ivf_assign().strip() + " SELECT vec_id, cell FROM assign"


def ann_topk_ivf_oracle() -> str:
    dot = _sql_dot("q.embedding", "c.embedding")
    nq = _sql_dot("q.embedding", "q.embedding")
    nc = _sql_dot("c.embedding", "c.embedding")
    return f"""
WITH {_sql_ivf_assign().strip()},
withc AS (SELECT e.vec_id, e.embedding, a.cell FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({dot} / (sqrt({nq}) * sqrt({nc})), 6) AS score
  FROM withc q JOIN withc c ON q.cell = c.cell
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------- embedding near-dup

def dedup_embedding_cosine(embeddings: DataFrame) -> DataFrame:
    """Near-duplicate vector pairs (a < b) with cosine >= threshold.
    IDs only — no float columns in the output."""
    vs = embeddings.select(F.col("vec_id"), _emb().alias("v"))
    return (
        vs.alias("x")
        .join(vs.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
        .filter(
            F.round(cosine(F.col("x.v"), F.col("y.v")), 6) >= NEAR_DUP_COSINE
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
    )


def dedup_embedding_cosine_oracle() -> str:
    dot = _sql_dot("x.embedding", "y.embedding")
    nx = _sql_dot("x.embedding", "x.embedding")
    ny = _sql_dot("y.embedding", "y.embedding")
    return f"""
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE ROUND({dot} / (sqrt({nx}) * sqrt({ny})), 6) >= {NEAR_DUP_COSINE}
"""
