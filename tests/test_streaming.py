"""Structured Streaming extraction: streamed per-turn triples equal the
batch path; checkpoint makes re-runs exactly-once."""

import datetime

from tripsu_spark.operators.extract import per_turn_triples
from tripsu_spark.schemas import TRANSCRIPT_SCHEMA
from tripsu_spark.sources.transcripts import synthetic_transcripts
from tripsu_spark.streaming.stream import (
    read_transcript_stream,
    run_stream_to_parquet,
    stream_entity_link_state,
)


def test_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    t = synthetic_transcripts(spark, n_convs=10, turns_per_conv=4)
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t.write.parquet(in_path)

    q = run_stream_to_parquet(spark, in_path, out_path, ckpt)
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.read.parquet(out_path).collect()}
    want = {tuple(r) for r in per_turn_triples(spark.read.parquet(in_path)).collect()}
    assert got == want and len(got) > 0

    # restart with same checkpoint: no new data -> no duplicates
    q2 = run_stream_to_parquet(spark, in_path, out_path, ckpt)
    q2.awaitTermination(120)
    again = {tuple(r) for r in spark.read.parquet(out_path).collect()}
    assert again == want


def test_stateful_link_counts_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: running per-conversation entity-link
    counts survive micro-batch boundaries (state, not window)."""
    TS = datetime.datetime(2024, 1, 1)
    in_path = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [("c1", 1, "user", "hi @user7", None, TS), ("c2", 1, "user", "yo @user3", None, TS)]
    batch2 = [("c1", 2, "user", "again @user7 and @user9", None, TS)]
    spark.createDataFrame(batch1, TRANSCRIPT_SCHEMA).write.mode("overwrite").parquet(in_path)

    def drain(name):
        rows = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        q = (
            stream_entity_link_state(read_transcript_stream(spark, in_path))
            .writeStream.foreachBatch(sink)
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["conv_id"], r["entity_id"]): r["mention_count"] for r in rows}

    got1 = drain("links1")
    assert got1 == {("c1", "7"): 1, ("c2", "3"): 1}

    spark.createDataFrame(batch2, TRANSCRIPT_SCHEMA).write.mode("append").parquet(in_path)
    got2 = drain("links2")
    # second drain emits only updated keys, with ACCUMULATED counts
    assert got2 == {("c1", "7"): 2, ("c1", "9"): 1}


def test_stream_conversation_stats_matches_batch(spark, tmp_path):
    """Running per-conversation stats across micro-batches AND a
    restart: the last emission per conv_id must equal the batch
    conversation_stats over everything ingested (all-integer columns,
    so equality is exact, not approximate)."""
    from tripsu_spark.operators.extract import conversation_stats
    from tripsu_spark.streaming.stream import stream_conversation_stats

    TS = datetime.datetime(2024, 1, 1)
    in_path = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        ("c1", 1, "user", "hello there", None, TS),
        ("c1", 2, "assistant", "hi!", "search", TS),
        ("c2", 1, "system", "boot", None, TS),
        # edge conversation: all-NULL turn_idx and text — the batch
        # aggregate's SUM/MAX yield NULL and the stream must emit NULL
        # too, not a 0 seed (r05 ADVICE item 3)
        ("c4", None, "user", None, None, TS),
    ]
    # c1 continues in a LATER drop (state must carry across batches
    # and across the restart); c3 is brand new after the restart
    batch2 = [
        ("c1", 3, "user", "more", None, TS),
        ("c3", 1, "user", "solo", "calc", TS),
    ]
    # nullable twin of TRANSCRIPT_SCHEMA: raw/un-quarantined input may
    # carry NULL turn_idx (the exact case the c4 row pins)
    nullable_schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    spark.createDataFrame(batch1, nullable_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_path)

    def drain(name):
        rows = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        q = (
            stream_conversation_stats(read_transcript_stream(spark, in_path))
            .writeStream.foreachBatch(sink)
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["conv_id"]: r for r in rows}  # last emission wins

    got1 = drain("convstats1")
    assert got1["c1"]["n_turns"] == 2 and got1["c1"]["user_frac_ppm"] == 500000
    assert got1["c2"]["n_roles"] == 1 and got1["c2"]["n_tool_turns"] == 0
    assert got1["c4"]["total_chars"] is None and got1["c4"]["max_turn_idx"] is None

    spark.createDataFrame(batch2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_path)
    got2 = drain("convstats2")
    # second drain emits only updated convs, with ACCUMULATED state
    assert set(got2) == {"c1", "c3"}

    merged = {**got1, **got2}
    want = {
        r["conv_id"]: r
        for r in conversation_stats(spark.read.parquet(in_path)).collect()
    }
    cols = [
        "n_turns", "n_roles", "n_tool_turns", "total_chars",
        "max_turn_idx", "n_user_turns", "user_frac_ppm",
    ]
    assert set(merged) == set(want)
    for cid in want:
        for c in cols:
            assert merged[cid][c] == want[cid][c], (cid, c)


def test_streaming_pass2_pseudonymizes_with_restart(spark, tmp_path):
    """Streaming pass 2 e2e: transcript drops -> pseudonymized triples
    via foreachBatch against the persisted pass-1 index; a second drop
    resumes from the checkpoint; a no-data restart changes nothing
    (idempotent batch=<id> partitions)."""
    from pyspark.sql import functions as F

    from tripsu_spark.crypto import Pseudonymizer
    from tripsu_spark.operators.extract import extract_triples
    from tripsu_spark.operators.index import build_type_index
    from tripsu_spark.plans.oracle import BENCH_SECRET
    from tripsu_spark.plans.pipeline import default_rules, pseudonymize
    from tripsu_spark.streaming.stream import run_pseudo_stream_to_parquet

    t_all = synthetic_transcripts(spark, n_convs=12, turns_per_conv=3)
    drop1 = t_all.filter(F.xxhash64("conv_id") % 2 == 0)
    drop2 = t_all.filter(F.xxhash64("conv_id") % 2 != 0)
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    index_path = str(tmp_path / "idx")
    rules, hasher = default_rules(), Pseudonymizer.create("sha256", BENCH_SECRET)

    # pass 1 (batch layer): persisted index over the full corpus
    build_type_index(extract_triples(t_all)).write.parquet(index_path)

    drop1.write.parquet(in_path)
    q = run_pseudo_stream_to_parquet(
        spark, in_path, index_path, out_path, ckpt, rules, hasher
    )
    q.awaitTermination(120)

    drop2.write.mode("append").parquet(in_path)
    q2 = run_pseudo_stream_to_parquet(
        spark, in_path, index_path, out_path, ckpt, rules, hasher
    )
    q2.awaitTermination(120)

    got = {tuple(r) for r in spark.read.parquet(out_path).drop("batch").collect()}
    want = {
        tuple(r)
        for r in pseudonymize(
            per_turn_triples(t_all), spark.read.parquet(index_path), rules, hasher
        ).collect()
    }
    assert got == want and len(got) > 0
    # hashes really applied: every hasText object is 64-char hex
    texts = [
        r["o_value"]
        for r in spark.read.parquet(out_path)
        .filter(F.col("predicate").endswith("hasText"))
        .collect()
    ]
    assert texts and all(len(v) == 64 for v in texts)

    # restart with no new data: nothing changes
    q3 = run_pseudo_stream_to_parquet(
        spark, in_path, index_path, out_path, ckpt, rules, hasher
    )
    q3.awaitTermination(120)
    again = {tuple(r) for r in spark.read.parquet(out_path).drop("batch").collect()}
    assert again == want


def test_streaming_dedup_drops_duplicates_across_batches(spark, tmp_path):
    """Two drops with duplicates inside and across them: the streaming
    dedup emits each digest once; a restart with the same checkpoint
    still remembers earlier digests (state in checkpoint)."""
    import datetime as dt

    from tripsu_spark.streaming.stream import run_dedup_stream_to_parquet

    in_path, out_path = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def drop(name, rows):
        spark.createDataFrame(
            rows, "doc_id bigint, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(in_path)

    # drop 1: A A B  (duplicate within the batch window)
    drop("d1", [(1, "text A", t0), (2, "text A", t0), (3, "text B", t0)])
    q = run_dedup_stream_to_parquet(spark, in_path, out_path, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out_path)
    assert sorted(r["text"] for r in first.collect()) == ["text A", "text B"]
    assert {r["doc_id"] for r in first.collect()} == {1, 3}  # first wins

    # drop 2 (restart, same checkpoint): A again within watermark + C
    drop("d2", [(4, "text A", t0 + dt.timedelta(minutes=5)),
                (5, "text C", t0 + dt.timedelta(minutes=5))])
    q = run_dedup_stream_to_parquet(spark, in_path, out_path, ckpt)
    q.awaitTermination()
    final = spark.read.parquet(out_path)
    assert sorted(r["text"] for r in final.collect()) == ["text A", "text B", "text C"]
    assert {r["doc_id"] for r in final.collect()} == {1, 3, 5}


def test_streaming_scrub_and_score_matches_batch(spark, tmp_path):
    """The streaming text-curation projection must be stateless (runs
    under availableNow with no watermark) and row-identical to the
    batch scrub_pii + repetition_metrics pair."""
    import datetime as dt

    from tripsu_spark.operators.text import repetition_metrics, scrub_pii
    from tripsu_spark.streaming.stream import (
        read_document_stream,
        stream_scrub_and_score,
    )

    in_path, out_path = str(tmp_path / "in"), str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "mail bob@x.io from 10.0.0.1 now now now now", t0),
        (2, "a clean sentence with all distinct words", t0),
        (3, "buy now buy now buy now", t0),
    ]
    batch = spark.createDataFrame(rows, "doc_id bigint, text string, ts timestamp")
    batch.coalesce(1).write.mode("append").parquet(in_path)

    q = (
        stream_scrub_and_score(read_document_stream(spark, in_path))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r for r in spark.read.parquet(out_path).collect()}
    pii = {r["doc_id"]: r for r in scrub_pii(batch).collect()}
    rep = {r["doc_id"]: r for r in repetition_metrics(batch).collect()}
    assert set(got) == {1, 2, 3}
    for did, row in got.items():
        assert row["scrubbed"] == pii[did]["scrubbed"]
        assert row["n_email"] == pii[did]["n_email"]
        assert row["n_ipv4"] == pii[did]["n_ipv4"]
        assert row["dup_bigram_frac"] == rep[did]["dup_bigram_frac"]
        assert row["top_token_frac"] == rep[did]["top_token_frac"]
    assert "<EMAIL>" in got[1]["scrubbed"] and "<IP>" in got[1]["scrubbed"]
