"""Executor-model scaling evidence: N vs 4N independent executor
processes (what spark-submit actually launches on a cluster), each a
separate JVM running the identical pass-2 map work over its share of
conversation buckets.

Threads in ONE JVM (local[8] vs local[32]) share a heap, a GC, and one
allocator — that is not what "4x more executors" means on a cluster.
This harness launches P OS processes, each `local[{threads}]`, over
disjoint `pmod(xxhash64(conv_id), P)` slices of the same input, and
reports:

- work_sec: max over executors of the timed job (executors are
  long-running services on a cluster; JVM/session startup is
  provisioning, reported separately)
- wall_sec: includes process + session startup, for full transparency

Usage: python tools/scaling_executors.py [turns] [N] [threads]
Defaults: 2_400_000 turns, N=2 executors vs 4N=8, 2 threads each.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORKER = r"""
import sys, time, os
sys.path.insert(0, {repo!r})
from tripsu_spark.session import get_spark
from tripsu_spark.operators.extract import per_turn_triples
from tripsu_spark.plans.pipeline import pseudonymize, default_rules
from tripsu_spark.crypto import Pseudonymizer
from tripsu_spark.plans.oracle import BENCH_SECRET
from tripsu_spark.functions.terms import serialize_triple_line
from pyspark.sql import functions as F

part, nparts, threads, tdir, idir = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
spark = get_spark(master=f"local[{{threads}}]", app_name=f"exec-{{part}}",
                  shuffle_partitions=threads * 2,
                  extra_conf={{"spark.driver.memory": "6g"}})
spark.sparkContext.setLogLevel("ERROR")
t0 = time.perf_counter()
t = spark.read.parquet(tdir).filter(F.pmod(F.xxhash64("conv_id"), F.lit(nparts)) == part)
index_df = spark.read.parquet(idir)
out = pseudonymize(per_turn_triples(t), index_df, default_rules(), Pseudonymizer.create("sha256", BENCH_SECRET))
row = out.agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(serialize_triple_line()))).collect()[0]
work = time.perf_counter() - t0
print(f"RESULT {{row[0]}} {{work:.3f}}", flush=True)
spark.stop()
"""


def run_config(nprocs: int, threads: int, tdir: str, idir: str, repo: str):
    script = WORKER.format(repo=repo)
    t_wall = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(nprocs), str(threads), tdir, idir],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(nprocs)
    ]
    rows, works = 0, []
    for p in procs:
        out, _ = p.communicate()
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, n, w = line.split()
                rows += int(n)
                works.append(float(w))
    wall = time.perf_counter() - t_wall
    assert len(works) == nprocs, f"missing results: {works}"
    return {"rows": rows, "work_sec": round(max(works), 3), "wall_sec": round(wall, 3)}


def main():
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repo = str(Path(__file__).resolve().parent.parent)

    from tripsu_spark.operators.extract import extract_triples
    from tripsu_spark.operators.index import build_type_index
    from tripsu_spark.session import get_spark
    from tripsu_spark.sources.transcripts import synthetic_transcripts

    base = tempfile.mkdtemp(prefix="scaling-exec-")
    tdir, idir = os.path.join(base, "transcripts"), os.path.join(base, "index")
    spark = get_spark(master="local[16]", app_name="scaling-setup", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    synthetic_transcripts(spark, n_convs=turns // 10, turns_per_conv=10).write.mode(
        "overwrite"
    ).parquet(tdir)
    # pass-1 index, shared input for both configs (untimed setup)
    build_type_index(extract_triples(spark.read.parquet(tdir))).write.mode(
        "overwrite"
    ).parquet(idir)
    spark.stop()

    results = {}
    for procs in (n, n * 4):
        best = None
        for _ in range(2):
            r = run_config(procs, threads, tdir, idir, repo)
            best = r if best is None or r["work_sec"] < best["work_sec"] else best
        best["rows_per_sec"] = int(best["rows"] / best["work_sec"])
        results[f"executors_{procs}"] = best

    thr_n = results[f"executors_{n}"]["rows_per_sec"]
    thr_4n = results[f"executors_{n * 4}"]["rows_per_sec"]
    results["scaling_efficiency_N_to_4N"] = round((thr_4n / thr_n) / 4, 3)
    results["config"] = {"turns": turns, "N_executors": n, "threads_per_executor": threads}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
