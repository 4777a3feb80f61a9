"""Extra benchmarks for the optimization rounds (guide §1.4).

bench.py is FROZEN for driver measurement; this file holds the
diagnostic harness: per-stage noop-sink isolation (so we time the
computation, not the sink), sub-plan timings inside extract_write
(scan / window / per-turn / derived), output file counts, and
`.explain("formatted")` dumps under plans/r06/.

Usage:
    python bench_extra.py            # isolation timings, JSON line
    python bench_extra.py --plans    # dump explain(formatted) only
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from tripsu_spark.crypto import Pseudonymizer  # noqa: E402
from tripsu_spark.functions.terms import serialize_triple_line  # noqa: E402
from tripsu_spark.operators.extract import (  # noqa: E402
    derived_triples,
    extract_triples,
    per_turn_triples,
)
from tripsu_spark.operators.index import build_type_index  # noqa: E402
from tripsu_spark.plans.lineage import predicate_partition_col, read_for_index  # noqa: E402
from tripsu_spark.plans.oracle import BENCH_SECRET  # noqa: E402
from tripsu_spark.plans.pipeline import default_rules, pseudonymize  # noqa: E402
from tripsu_spark.session import FAST_WRITE_CONF, get_spark  # noqa: E402
from tripsu_spark.sources.transcripts import transcripts_from_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
PLAN_DIR = Path(__file__).resolve().parent / "plans" / "r06"

# A/B experiments: extra Spark conf as a JSON object, e.g.
#   BE_CONF='{"spark.sql.adaptive.coalescePartitions.minPartitionSize":"64k"}'
EXTRA_CONF = dict(FAST_WRITE_CONF)
EXTRA_CONF.update(json.loads(os.environ.get("BE_CONF", "{}")))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label: str, fn, reps: int = REPS) -> float:
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def count_files(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.startswith("part-"))
    return n


def build(spark, workdir):
    """The exact frames bench.py's stages evaluate."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    transcripts = transcripts_from_events(events)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    graph_path = os.path.join(workdir, "graph_raw")
    index_path = os.path.join(workdir, "type_index")
    return events, transcripts, hasher, rules, graph_path, index_path


def dump_plan(name: str, df) -> None:
    PLAN_DIR.mkdir(parents=True, exist_ok=True)
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    (PLAN_DIR / name).write_text(text)


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark(
        master=f"local[{CPUS}]", app_name="tripsu-bench-extra", extra_conf=EXTRA_CONF
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="tripsu-bench-extra-")
    events, transcripts, hasher, rules, graph_path, index_path = build(spark, workdir)

    out: dict = {"sf_dir": SF_DIR, "cpus": int(CPUS), "reps": REPS}

    # --- extract_write decomposition (noop sinks) ---
    out["scan_events"] = timed(spark, "noop: events scan", lambda: noop(events))
    out["transcripts"] = timed(spark, "noop: transcripts (scan+window)", lambda: noop(transcripts))
    out["per_turn"] = timed(spark, "noop: per_turn_triples", lambda: noop(per_turn_triples(transcripts)))
    out["derived"] = timed(spark, "noop: derived_triples", lambda: noop(derived_triples(transcripts)))
    out["extract_noop"] = timed(spark, "noop: extract_triples", lambda: noop(extract_triples(transcripts)))

    def extract_write():
        (
            extract_triples(transcripts)
            .withColumn("pred_part", predicate_partition_col())
            .write.mode("overwrite")
            .partitionBy("pred_part")
            .parquet(graph_path)
        )
        return spark.read.parquet(graph_path).count()

    out["extract_write"] = timed(spark, "extract_write (real sink)", extract_write)
    out["graph_files"] = count_files(graph_path)

    # --- index ---
    out["index_noop"] = timed(
        spark, "noop: index", lambda: noop(build_type_index(read_for_index(spark, graph_path)))
    )

    def index_write():
        build_type_index(read_for_index(spark, graph_path)).write.mode("overwrite").parquet(index_path)
        return spark.read.parquet(index_path).count()

    out["index_write"] = timed(spark, "index (real sink)", index_write)
    out["index_files"] = count_files(index_path)

    # --- pseudo / serialize (noop isolation; bench uses force()) ---
    def stored():
        return spark.read.parquet(graph_path).drop("pred_part")

    def index_df():
        return spark.read.parquet(index_path)

    out["pseudo_noop"] = timed(
        spark, "noop: pseudo", lambda: noop(pseudonymize(stored(), index_df(), rules, hasher))
    )
    out["serialize_noop"] = timed(
        spark,
        "noop: serialize",
        lambda: noop(
            pseudonymize(stored(), index_df(), rules, hasher).select(
                serialize_triple_line().alias("line")
            )
        ),
    )

    # force() replicas (what bench.py actually times beyond the write)
    def force(df) -> int:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns])
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    out["pseudo_force"] = timed(
        spark, "force: pseudo", lambda: force(pseudonymize(stored(), index_df(), rules, hasher))
    )
    out["serialize_force"] = timed(
        spark,
        "force: serialize",
        lambda: force(
            pseudonymize(stored(), index_df(), rules, hasher).select(
                serialize_triple_line().alias("line")
            )
        ),
    )

    print(json.dumps(out))
    spark.stop()


def dump_plans(suffix: str) -> None:
    spark = get_spark(
        master=f"local[{CPUS}]", app_name="tripsu-plans", extra_conf=EXTRA_CONF
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="tripsu-plans-")
    events, transcripts, hasher, rules, graph_path, index_path = build(spark, workdir)
    # materialize graph + index once so pseudo/serialize read real parquet
    (
        extract_triples(transcripts)
        .withColumn("pred_part", predicate_partition_col())
        .write.mode("overwrite")
        .partitionBy("pred_part")
        .parquet(graph_path)
    )
    build_type_index(read_for_index(spark, graph_path)).write.mode("overwrite").parquet(index_path)
    stored = spark.read.parquet(graph_path).drop("pred_part")
    index_df = spark.read.parquet(index_path)

    dump_plan(f"extract_write_{suffix}.txt", extract_triples(transcripts).withColumn(
        "pred_part", predicate_partition_col()
    ))
    dump_plan(f"index_{suffix}.txt", build_type_index(read_for_index(spark, graph_path)))
    dump_plan(f"pseudo_{suffix}.txt", pseudonymize(stored, index_df, rules, hasher))
    dump_plan(
        f"serialize_{suffix}.txt",
        pseudonymize(stored, index_df, rules, hasher).select(
            serialize_triple_line().alias("line")
        ),
    )
    spark.stop()


if __name__ == "__main__":
    if "--plans" in sys.argv:
        i = sys.argv.index("--plans")
        suffix = sys.argv[i + 1] if len(sys.argv) > i + 1 else "before"
        dump_plans(suffix)
    else:
        main()
