"""Quota-capper skew stress — measures WHEN the salted two-phase shape
pays (BENCH.md row; guidance in cap_per_group's docstring).

Finding first (this tool is the evidence): on Spark >= 3.5 the
``InferWindowGroupLimit`` rule plants a PARTIAL WindowGroupLimit
before the exchange for rank-filter windows (rk <= n, n below
``spark.sql.optimizer.windowGroupLimitThreshold``, default 1000), so
every map task locally keeps only its top-n per group and the skewed
group's single reducer receives at most map_tasks * n rows — the
optimizer already performs the equivalent of manual salting, for any
skew. The manual salt is therefore only the right tool on engines
WITHOUT that rule (Spark < 3.5), or for caps above the threshold.

This tool demonstrates both regimes on one input — a single dominant
source holding ~99% of the corpus, built from a DATA-DEPENDENT
expression (a constant-literal source would be constant-folded into a
partitionless window and rewritten to TakeOrderedAndProject, which
measures nothing):

  1. rule ON  (modern engine): direct vs salted — direct should win
     or tie; the salt just adds a pass.
  2. rule OFF (windowGroupLimitThreshold=-1, modeling Spark < 3.5):
     direct funnels the dominant group through ONE task's external
     sort; salted spreads it over --salt tasks.

  python tools/stress_capper.py [--rows 50000000] [--salt 256]
      [--cores 8] [--heap 4g]

Prints one JSON line with the four wall times + speedups; asserts all
four variants return identical results.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_RULE_THR = "spark.sql.optimizer.windowGroupLimitThreshold"


def skewed_docs(spark, n_rows: int):
    from pyspark.sql import functions as F

    # ~99% of rows in one dominant source, 1% spread over 1000 tail
    # sources; source derives from doc_id so nothing constant-folds.
    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.col("id"), F.lit(100)) < 99, F.lit("the_big_one"))
        .otherwise(F.concat(F.lit("tail"), F.pmod(F.col("id"), F.lit(1000))))
        .alias("source"),
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
    docs = skewed_docs(spark, args.rows)

    def timed(label, df):
        t0 = time.monotonic()
        row = df.agg(
            F.count("*").alias("c"),
            F.bit_xor(F.xxhash64("doc_id", "source")).alias("s"),
        ).collect()[0]
        out[label + "_sec"] = round(time.monotonic() - t0, 2)
        return int(row["c"]), int(row["s"] or 0)

    default_thr = spark.conf.get(_RULE_THR)
    results = {}
    for rule_on in (True, False):
        spark.conf.set(_RULE_THR, default_thr if rule_on else "-1")
        tag = "ruleon" if rule_on else "ruleoff"
        results[tag, "direct"] = timed(f"{tag}_direct", cap_per_group(docs, n=args.n))
        results[tag, "salted"] = timed(
            f"{tag}_salted", cap_per_group(docs, n=args.n, salt=args.salt)
        )
    spark.conf.set(_RULE_THR, default_thr)
    assert len(set(results.values())) == 1, results  # all four identical
    out["kept_rows"] = results["ruleon", "direct"][0]
    out["ruleon_salted_speedup"] = round(
        out["ruleon_direct_sec"] / out["ruleon_salted_sec"], 2
    )
    out["ruleoff_salted_speedup"] = round(
        out["ruleoff_direct_sec"] / out["ruleoff_salted_sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
