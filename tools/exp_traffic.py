"""Per-row memory-traffic experiment harness (verdict r2 item 1).

Runs the flagship stages (extract+write graph table / index /
pseudo+serialize) on seeded synthetic transcripts at a given core
count, storage level and write mode, and reports stage walls plus the
stored graph-table bytes. One JSON line on stdout.

Modes:
  --cold   drop the page cache (sync; echo 3 > /proc/sys/vm/drop_caches)
           before every timed pass-2 stage, so reads hit the disk —
           the IO-bound configuration the round-2 verdict asked to
           measure compact storage against. Requires root.

Meant to be orchestrated one-subprocess-per-config (driver heap is
fixed at JVM launch), e.g.:

  for L in 0 1 2; do
    python tools/exp_traffic.py --cores 8 --compact $L --turns 1200000
  done
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from _exputil import drop_caches, du_bytes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--compact", type=int, default=0, help="storage level 0/1/2")
    ap.add_argument("--cw", type=int, default=0, help="concurrent writers (0 = planned write)")
    ap.add_argument("--turns", type=int, default=1_200_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--heap-per-core", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tripsu_spark.crypto import Pseudonymizer
    from tripsu_spark.functions.terms import serialize_triple_line
    from tripsu_spark.operators.extract import extract_triples
    from tripsu_spark.operators.index import build_type_index
    from tripsu_spark.plans.compact import compact_triples, maybe_expand
    from tripsu_spark.plans.lineage import predicate_partition_col, read_for_index
    from tripsu_spark.plans.oracle import BENCH_SECRET
    from tripsu_spark.plans.pipeline import default_rules, pseudonymize
    from tripsu_spark.session import FAST_WRITE_CONF, get_spark
    from tripsu_spark.sources.transcripts import synthetic_transcripts

    extra = dict(FAST_WRITE_CONF)
    extra["spark.driver.memory"] = f"{args.cores * args.heap_per_core}g"
    extra["spark.driver.extraJavaOptions"] = (
        f"-XX:ParallelGCThreads={max(args.cores, 1)}"
        f" -XX:ConcGCThreads={max(args.cores // 4, 1)}"
    )
    if args.cw:
        extra["spark.sql.optimizer.plannedWrite.enabled"] = "false"
        extra["spark.sql.maxConcurrentOutputFileWriters"] = str(args.cw)
    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name=f"exp-traffic-{args.cores}-L{args.compact}",
        shuffle_partitions=args.cores * 2,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = f"/tmp/exp-traffic-{args.cores}-L{args.compact}-cw{args.cw}"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    graph_path = os.path.join(workdir, "graph_raw")
    index_path = os.path.join(workdir, "type_index")

    transcripts = synthetic_transcripts(
        spark, n_convs=args.turns // 10, turns_per_conv=10
    )
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()

    def store(df):
        return compact_triples(df, level=args.compact) if args.compact else df

    def force(df) -> int:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64(
                    *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
                )
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    def s_extract_write():
        (
            store(
                extract_triples(transcripts).withColumn(
                    "pred_part", predicate_partition_col()
                )
            )
            .write.mode("overwrite")
            .partitionBy("pred_part")
            .parquet(graph_path)
        )
        return spark.read.parquet(graph_path).count()

    def s_index():
        build_type_index(read_for_index(spark, graph_path)).write.mode(
            "overwrite"
        ).parquet(index_path)
        return spark.read.parquet(index_path).count()

    def s_pass2():
        stored = maybe_expand(spark.read.parquet(graph_path).drop("pred_part"))
        out = pseudonymize(stored, spark.read.parquet(index_path), rules, hasher)
        return force(out.select(serialize_triple_line().alias("line")))

    stages = {"extract_write": s_extract_write, "index": s_index, "pass2": s_pass2}
    walls: dict[str, list[float]] = {k: [] for k in stages}
    rows: dict[str, int] = {}
    for _ in range(args.reps):
        for name, fn in stages.items():
            if args.cold and name != "extract_write":
                drop_caches()
            t0 = time.perf_counter()
            rows[name] = fn()
            walls[name].append(round(time.perf_counter() - t0, 3))

    best = {k: min(v) for k, v in walls.items()}
    result = {
        "cores": args.cores,
        "compact": args.compact,
        "cw": args.cw,
        "cold": args.cold,
        "turns": args.turns,
        "triples": rows.get("pass2"),
        "graph_bytes": du_bytes(graph_path),
        "best": best,
        "all": walls,
        "total": round(sum(best.values()), 3),
        "pass2_rows_per_sec": int(rows["pass2"] / best["pass2"]),
        "e2e_rows_per_sec": int(rows["pass2"] / sum(best.values())),
    }
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
