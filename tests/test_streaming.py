"""Structured Streaming extraction: streamed per-turn triples equal the
batch path; checkpoint makes re-runs exactly-once."""

from tripsu_spark.operators.extract import per_turn_triples
from tripsu_spark.sources.transcripts import synthetic_transcripts
from tripsu_spark.streaming.stream import run_stream_to_parquet


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
