"""Benchmark harness.

Default: run the headline pipeline stages at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...extras}.

--scaling: run the identical flagship job at local[8] and local[32]
(N vs 4N parallelism — the sandbox stand-in for N vs 4N executors,
per driver instruction) and report throughput at both plus efficiency
= (thr_4N / thr_N) / 4 into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from tripsu_spark.crypto import Pseudonymizer  # noqa: E402
from tripsu_spark.functions.terms import serialize_triple_line  # noqa: E402
from tripsu_spark.operators.extract import extract_triples  # noqa: E402
from tripsu_spark.operators.index import build_type_index  # noqa: E402
from tripsu_spark.plans.oracle import BENCH_SECRET  # noqa: E402
from tripsu_spark.plans.pipeline import default_rules, pseudonymize  # noqa: E402
from tripsu_spark.session import get_spark  # noqa: E402
from tripsu_spark.sources.transcripts import transcripts_from_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def force(df) -> int:
    """Force full evaluation of every column (count() alone would let
    Catalyst prune the hash projections away)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(row["n"])


def pipeline_stages(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = transcripts_from_events(events)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()

    def q_extract():
        return force(extract_triples(transcripts))

    def q_index():
        return force(build_type_index(extract_triples(transcripts)))

    def q_pseudo():
        triples = extract_triples(transcripts)
        return force(pseudonymize(triples, build_type_index(triples), rules, hasher))

    def q_serialize():
        triples = extract_triples(transcripts)
        out = pseudonymize(triples, build_type_index(triples), rules, hasher)
        return force(out.select(serialize_triple_line().alias("line")))

    return {
        "extract": q_extract,
        "index": q_index,
        "pseudo_e2e": q_pseudo,
        "serialize_e2e": q_serialize,
    }


def flagship_rows_and_time(spark, sf_dir) -> tuple[int, float]:
    """The end-to-end job used for scaling measurements: extract ->
    index -> pseudonymize -> serialize, fully evaluated."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = transcripts_from_events(events)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    t0 = time.perf_counter()
    triples = extract_triples(transcripts)
    out = pseudonymize(triples, build_type_index(triples), rules, hasher)
    n = force(out.select(serialize_triple_line().alias("line")))
    return n, time.perf_counter() - t0


def run_default() -> dict:
    spark = get_spark(master=f"local[{CPUS}]", app_name="tripsu-bench")
    spark.sparkContext.setLogLevel("ERROR")
    stages = pipeline_stages(spark, SF_DIR)
    queries: dict[str, float] = {}
    rows = {}
    # warmup (JIT, parquet footer cache)
    stages["extract"]()
    for name, fn in stages.items():
        t0 = time.perf_counter()
        rows[name] = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(queries.values()), 3)
    triples_per_sec = int(rows["pseudo_e2e"] / queries["pseudo_e2e"]) if queries["pseudo_e2e"] else 0
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "kg_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": rows,
        "triples_per_sec": triples_per_sec,
        "cpus": int(CPUS),
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """Same job, same input, local[8] vs local[32]."""
    out = {}
    for cores in (8, 32):
        spark = get_spark(
            master=f"local[{cores}]",
            app_name=f"tripsu-scaling-{cores}",
            shuffle_partitions=cores,
        )
        spark.sparkContext.setLogLevel("ERROR")
        # warmup
        flagship_rows_and_time(spark, SF_DIR)
        best = None
        for _ in range(3):
            n, secs = flagship_rows_and_time(spark, SF_DIR)
            best = min(best, secs) if best else secs
        out[cores] = {"rows": n, "sec": round(best, 3), "rows_per_sec": int(n / best)}
        spark.stop()
    thr8, thr32 = out[8]["rows_per_sec"], out[32]["rows_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    report = {
        "input": SF_DIR,
        "local8": out[8],
        "local32": out[32],
        "scaling_efficiency_N_to_4N": eff,
    }
    md = (
        "# BENCH — scaling evidence (N vs 4N parallelism)\n\n"
        "Same flagship job (events -> transcripts -> extract -> type index ->\n"
        "pseudonymize -> serialize, fully evaluated) on identical input\n"
        f"(`{SF_DIR}`), run at local[8] and local[32] (best of 3 after warmup):\n\n"
        "| parallelism | rows | sec | rows/sec |\n|---|---|---|---|\n"
        f"| local[8] (N) | {out[8]['rows']} | {out[8]['sec']} | {thr8} |\n"
        f"| local[32] (4N) | {out[32]['rows']} | {out[32]['sec']} | {thr32} |\n\n"
        f"**Scaling efficiency (thr_4N / thr_N) / 4 = {eff}** (target >= 0.8, BASELINE.json north_rule).\n"
    )
    Path("BENCH.md").write_text(md)
    return report


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_default()))
