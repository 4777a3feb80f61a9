"""Quota-capper skew stress: the regime where the salted two-phase
shape PAYS (BENCH.md row; guidance threshold in curation.py docstring).

stress_curation.py showed salt=64 COSTS an extra pass at 10M docs /
1000 sources (largest group 2M rows — still one comfortable task).
This tool synthesizes the opposite regime: ONE source holding the
whole corpus (default 50M rows), so the direct window funnels every
row through a single task's external sort while the other cores idle,
and memory pressure is real (run with a small heap to model executor
task memory). The salted phase-1 spreads the same sort over
``--salt`` tasks; phase 2 sorts only salt*n survivors.

  python tools/stress_capper.py [--rows 50000000] [--salt 256]
      [--cores 8] [--heap 4g] [--also-small]

Prints one JSON line: wall seconds for direct vs salted at the big
single-group input, and (with --also-small) the 10M/1000-source
control where salting loses — the two ends of the threshold.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def one_group_docs(spark, n_rows: int):
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.lit("the_one_source").alias("source"),
        (F.pmod(F.hash("id"), F.lit(4000)) + 100).alias("n_chars"),
    )


def many_group_docs(spark, n_rows: int, n_sources: int = 1000):
    from pyspark.sql import functions as F

    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(n_sources))).alias("source"),
        (F.pmod(F.hash("id"), F.lit(4000)) + 100).alias("n_chars"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--salt", type=int, default=256)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--heap", default="4g",
                    help="driver heap — small on purpose, models one executor")
    ap.add_argument("--n", type=int, default=100, help="cap per group")
    ap.add_argument("--also-small", action="store_true",
                    help="also run the 10M/1000-source control where salting loses")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tripsu_spark.operators.curation import cap_per_group
    from tripsu_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="stress-capper",
        shuffle_partitions=args.cores * 4,
        extra_conf={"spark.driver.memory": args.heap},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "rows": args.rows, "salt": args.salt, "cores": args.cores,
        "heap": args.heap, "n": args.n,
    }

    def timed(label, df):
        t0 = time.monotonic()
        # checksum forces full evaluation of every output row
        row = df.agg(
            F.count("*").alias("c"), F.sum("doc_id").alias("s")
        ).collect()[0]
        out[label + "_sec"] = round(time.monotonic() - t0, 2)
        return int(row["c"]), int(row["s"] or 0)

    big = one_group_docs(spark, args.rows)
    direct = timed("one_group_direct", cap_per_group(big, n=args.n))
    salted = timed("one_group_salted", cap_per_group(big, n=args.n, salt=args.salt))
    assert direct == salted, (direct, salted)
    out["one_group_kept"] = direct[0]
    out["speedup_salted"] = round(
        out["one_group_direct_sec"] / out["one_group_salted_sec"], 2
    )

    if args.also_small:
        small = many_group_docs(spark, 10_000_000)
        d = timed("many_groups_direct", cap_per_group(small, n=args.n))
        s = timed("many_groups_salted", cap_per_group(small, n=args.n, salt=64))
        assert d == s
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
