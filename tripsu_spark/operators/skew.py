"""Skew handling: salted conversation repartitioning (north_star:
"conversations are salted-repartitioned on conv_id with skew-aware AQE
splits").

Two complementary mechanisms:
- AQE skew splits (`spark.sql.adaptive.skewJoin.*`, on by default in
  session.py) repair skew at JOIN time;
- ``salted_repartition`` repairs skew at LAYOUT time, for the
  per-conversation processing paths: hashing on (conv_id, salt) where
  salt = turn_idx mod S splits a hot conversation's turns across up to
  S partitions while keeping placement deterministic. Row-local
  operators (per-turn extraction) are placement-independent, so this
  is always safe for them; conversation-global aggregates must group
  by conv_id (a shuffle) regardless, which AQE skew-handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    transcripts: DataFrame, num_partitions: int, salt_buckets: int = 16
) -> DataFrame:
    """Deterministic skew-safe layout: partition by (conv_id, salt),
    sorted within partitions by (conv_id, turn_idx) for stable turn
    order (the north_rule per-turn ordering invariant)."""
    salted = transcripts.withColumn(
        "_salt", F.pmod(F.col("turn_idx"), F.lit(salt_buckets))
    )
    return (
        salted.repartition(num_partitions, F.col("conv_id"), F.col("_salt"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .drop("_salt")
    )


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per partition — test/diagnostic helper."""
    return [
        r["n"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
