"""Salted repartitioning bounds hot-conversation partition sizes
(SURVEY.md §5 item 4: one conv_id holding ~30% of turns)."""

from pyspark.sql import functions as F

from tripsu_spark.operators.extract import extract_triples, per_turn_triples
from tripsu_spark.operators.skew import partition_histogram, salted_repartition
from tripsu_spark.sources.transcripts import synthetic_transcripts


def test_salting_bounds_hot_partition(spark):
    t = synthetic_transcripts(
        spark, n_convs=30, turns_per_conv=5, skew_conv="conv-hot", skew_turns=200
    )  # 350 rows, hot conv = 57%
    nparts = 8

    unsalted = t.repartition(nparts, F.col("conv_id"))
    salted = salted_repartition(t, nparts, salt_buckets=16)

    hist_u = partition_histogram(unsalted)
    hist_s = partition_histogram(salted)
    assert sum(hist_u) == sum(hist_s) == 350
    # the hot conversation pins >=200 rows to one unsalted partition;
    # salting must spread it far below that
    assert max(hist_u) >= 200
    assert max(hist_s) < 150

    # placement never changes results
    a = {tuple(r) for r in per_turn_triples(t).collect()}
    b = {tuple(r) for r in per_turn_triples(salted).collect()}
    assert a == b


def test_salted_layout_preserves_turn_order_within_partition(spark):
    t = synthetic_transcripts(spark, n_convs=20, turns_per_conv=6)
    salted = salted_repartition(t, 4, salt_buckets=4)

    def check(it):
        last = {}
        for row in it:
            key = row["conv_id"]
            if key in last:
                assert row["turn_idx"] > last[key], "turn order broken"
            last[key] = row["turn_idx"]
        return iter([])

    # mapPartitions check: within each partition, per-conv turn_idx is increasing
    list(salted.rdd.mapPartitions(lambda it: check(it)).collect())


def test_extraction_on_salted_layout_matches(spark):
    t = synthetic_transcripts(
        spark, n_convs=15, turns_per_conv=4, skew_conv="conv-hot", skew_turns=50
    )
    a = {tuple(r) for r in extract_triples(t).collect()}
    b = {tuple(r) for r in extract_triples(salted_repartition(t, 6)).collect()}
    assert a == b
