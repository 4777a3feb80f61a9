"""Cold-read scan experiment: stored bytes -> wall time (verdict r2 item 1).

Materializes the flagship graph table once per storage level (0 =
standard, 1 = prefix-compacted, 2 = + dictionary-coded tinyints), then
measures a full-column scan of each layout with the page cache dropped
before every rep — the IO-bound configuration. The scan aggregates the
byte length of every column (forces full decode, ~zero other compute),
so wall time tracks bytes through disk + parquet decode.

Also measures the same scan warm (page-cached) for the DRAM-side
comparison, and the cold *pass-2* (expand -> pseudonymize -> serialize)
wall so the byte reduction is shown end-to-end, not just scan-deep.

Run:  python tools/exp_coldscan.py [--turns 1200000] [--cores 8] [--reps 3]
Root required (drops the page cache).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from _exputil import drop_caches, du_bytes  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_200_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=str, default="0,2")
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

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="exp-coldscan",
        shuffle_partitions=args.cores * 2,
        extra_conf={**FAST_WRITE_CONF, "spark.driver.memory": "32g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tripsu_spark.sources.transcripts import synthetic_transcripts

    transcripts = synthetic_transcripts(spark, n_convs=args.turns // 10, turns_per_conv=10)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    levels = [int(x) for x in args.levels.split(",")]

    base = Path("/tmp/exp-coldscan")
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir()

    results = {}
    for level in levels:
        gp = str(base / f"graph_L{level}")
        ip = str(base / f"index_L{level}")
        df = extract_triples(transcripts).withColumn("pred_part", predicate_partition_col())
        if level:
            df = compact_triples(df, level=level)
        df.write.mode("overwrite").partitionBy("pred_part").parquet(gp)
        build_type_index(read_for_index(spark, gp)).write.mode("overwrite").parquet(ip)

        def scan():
            raw = spark.read.parquet(gp).drop("pred_part")
            agg = [
                F.sum(F.coalesce(F.length(F.col(c).cast("string")), F.lit(0))).alias(c)
                for c in raw.columns
            ]
            row = raw.agg(*agg).collect()[0]
            return int(sum(v or 0 for v in row))

        def pass2():
            stored = maybe_expand(spark.read.parquet(gp).drop("pred_part"))
            out = pseudonymize(stored, spark.read.parquet(ip), rules, hasher)
            return out.select(serialize_triple_line().alias("line")).agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("line")).alias("h"),
            ).collect()[0]["n"]

        timings = {"scan_cold": [], "scan_warm": [], "pass2_cold": []}
        decoded = n = 0
        for _ in range(args.reps):
            drop_caches()
            t0 = time.perf_counter(); decoded = scan()
            timings["scan_cold"].append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter(); scan()
            timings["scan_warm"].append(round(time.perf_counter() - t0, 3))
            drop_caches()
            t0 = time.perf_counter(); n = pass2()
            timings["pass2_cold"].append(round(time.perf_counter() - t0, 3))
        results[f"L{level}"] = {
            "stored_bytes": du_bytes(gp),
            "decoded_string_bytes": decoded,
            "triples": n,
            "best": {k: min(v) for k, v in timings.items()},
            "all": timings,
        }

    out = {
        "turns": args.turns,
        "cores": args.cores,
        "reps": args.reps,
        "levels": results,
    }
    if "L0" in results and "L2" in results:
        out["bytes_ratio_L2_vs_L0"] = round(
            results["L2"]["stored_bytes"] / results["L0"]["stored_bytes"], 3
        )
        out["cold_scan_ratio_L2_vs_L0"] = round(
            results["L2"]["best"]["scan_cold"] / results["L0"]["best"]["scan_cold"], 3
        )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
