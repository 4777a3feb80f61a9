"""Transcript source (graft input, BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp). In production this is an Iceberg table
read (``spark.read.format("iceberg").load(...)``); in this sandbox the
Iceberg runtime jar is absent, so tables are parquet directories with
the identical layout (the snapshot/lineage logic in plans/lineage.py
provides the resume semantics Iceberg snapshots would).

``transcripts_from_events`` derives a deterministic transcript table
from the driver-provided ``events`` parquet (TESTDATA.md) — no external
data, same result in Spark and DuckDB (the oracle re-derives it in
SQL). ``synthetic_transcripts`` generates a standalone seeded corpus
for unit tests and skew fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) ->
    transcripts. One conversation per user, turns ordered by (ts,
    event_id). The matching ANSI SQL lives in
    tripsu_spark/plans/oracle.py::TRANSCRIPTS_SQL."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "error", F.lit("system"))
        .when(F.col("event_type").isin("signup", "purchase"), F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat(
            F.lit("user @user"),
            F.col("user_id").cast("string"),
            F.lit(" did "),
            F.col("event_type"),
            F.lit(" on #item"),
            (F.col("event_id") % 50).cast("string"),
            F.lit(" props="),
            F.col("props"),
        ).alias("text"),
        F.when(F.col("event_type") == "purchase", F.lit("checkout"))
        .when(F.col("event_type") == "click", F.lit("browser"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    turns_per_conv: int = 8,
    skew_conv: str | None = None,
    skew_turns: int = 0,
) -> DataFrame:
    """Seeded synthetic transcripts built from ``spark.range`` — fully
    deterministic column expressions, no driver-side data, scales to
    any size (used by bench.py at larger row counts).

    skew_conv/skew_turns append one pathologically hot conversation for
    skew-handling tests (SURVEY.md §5 item 4).
    """
    base = (
        spark.range(n_convs * turns_per_conv)
        .select(
            F.concat(F.lit("conv-"), (F.col("id") / turns_per_conv).cast("long").cast("string")).alias("conv_id"),
            (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
            F.when(F.col("id") % 3 == 0, F.lit("user"))
            .when(F.col("id") % 3 == 1, F.lit("assistant"))
            .otherwise(F.lit("system"))
            .alias("role"),
            F.concat(
                F.lit("turn "),
                (F.col("id") % turns_per_conv).cast("string"),
                F.lit(" mentions @user"),
                (F.col("id") % 17).cast("string"),
                F.lit(" and #item"),
                (F.col("id") % 29).cast("string"),
            ).alias("text"),
            F.when(F.col("id") % 5 == 0, F.lit("search"))
            .otherwise(F.lit(None).cast("string"))
            .alias("tool"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        )
    )
    if skew_conv and skew_turns > 0:
        hot = spark.range(skew_turns).select(
            F.lit(skew_conv).alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("hot turn mentions @user1 #item"), (F.col("id") % 7).cast("string")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(1800000000) + F.col("id")).alias("ts"),
        )
        base = base.unionByName(hot)
    return base
