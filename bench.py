"""Benchmark harness.

Default: run the headline pipeline stages at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...extras}.

--scaling: run the identical flagship job at local[N] and local[4N]
(default 1 vs 4 — the sandbox stand-in for N vs 4N executors, per
driver instruction; see BENCH.md for why low N models real executors
on this one box) and report throughput at both plus efficiency
= (thr_4N / thr_N) / 4 into BENCH.md. Each scale point runs in its own
subprocess with per-executor-model resources (heap and GC threads
scale with cores).
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
from tripsu_spark.session import FAST_WRITE_CONF, get_spark  # noqa: E402
from tripsu_spark.sources.transcripts import transcripts_from_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# Compact graph-table storage level (plans/compact.py): 1 = prefix
# codes, 2 = prefix codes + dictionary-coded kind/predicate/datatype
# tinyints. Fewer bytes through the pre-write sort, parquet codec,
# page cache and pass-2 scans. Exact round-trip. Off by default on
# this box: the 100 MB test table lives in page cache, so the
# substr/concat cost (~5%) has no IO win to offset — flip on for
# genuinely IO-bound deployments (see BENCH.md cold-read numbers).
_compact_env = os.environ.get("SPARK_GRAFT_COMPACT", "0").strip() or "0"
if _compact_env not in ("0", "1", "2"):
    raise SystemExit(
        f"SPARK_GRAFT_COMPACT must be 0, 1 or 2 (got {_compact_env!r}): "
        "0 standard, 1 prefix-compacted, 2 dictionary-coded"
    )
COMPACT = int(_compact_env)


def _store(df):
    """Apply the storage level. Callers compute pred_part BEFORE this
    (level 2 dictionary-codes the predicate column away)."""
    from tripsu_spark.plans.compact import compact_triples

    return compact_triples(df, level=COMPACT) if COMPACT else df


def _load(df):
    from tripsu_spark.plans.compact import maybe_expand

    return maybe_expand(df)


def force(df) -> int:
    """Force full evaluation of every column (count() alone would let
    Catalyst prune the hash projections away)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns])).alias("h"),
    ).collect()[0]
    return int(row["n"])


def pipeline_stages(spark, sf_dir, workdir):
    """Materialized two-pass flow — the architecture the lineage runner
    uses and the one that scales: extraction writes the graph table
    once, predicate-partitioned, so pass 1 (rdf:type only) reads ONE
    partition (partition pruning) instead of re-running extraction."""
    from tripsu_spark.plans.lineage import predicate_partition_col, read_for_index

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = transcripts_from_events(events)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    graph_path = os.path.join(workdir, "graph_raw")

    def q_extract_write():
        (
            _store(
                extract_triples(transcripts).withColumn(
                    "pred_part", predicate_partition_col()
                )
            )
            .write.mode("overwrite")
            .partitionBy("pred_part")
            .parquet(graph_path)
        )
        return spark.read.parquet(graph_path).count()

    index_path = os.path.join(workdir, "type_index")

    def stored():
        return _load(spark.read.parquet(graph_path).drop("pred_part"))

    def q_index():
        # Pass 1 persists the index (tripsu writes index.json; we write
        # parquet) — pass 2 consumes the MATERIALIZED index, so the
        # collect_set aggregate runs once, not once per join side.
        build_type_index(read_for_index(spark, graph_path)).write.mode(
            "overwrite"
        ).parquet(index_path)
        return spark.read.parquet(index_path).count()

    def q_pseudo():
        index_df = spark.read.parquet(index_path)
        return force(pseudonymize(stored(), index_df, rules, hasher))

    def q_serialize():
        index_df = spark.read.parquet(index_path)
        out = pseudonymize(stored(), index_df, rules, hasher)
        return force(out.select(serialize_triple_line().alias("line")))

    return {
        "extract_write": q_extract_write,
        "index": q_index,
        "pseudo": q_pseudo,
        "serialize": q_serialize,
    }


def flagship_rows_and_time(spark, sf_dir, workdir) -> tuple[int, float]:
    """End-to-end job for scaling runs: extract -> materialize graph ->
    index -> pseudonymize -> serialize, fully evaluated."""
    import shutil

    from tripsu_spark.plans.lineage import predicate_partition_col, read_for_index

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = transcripts_from_events(events)
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    graph_path = os.path.join(workdir, "graph_raw")
    shutil.rmtree(graph_path, ignore_errors=True)
    t0 = time.perf_counter()
    (
        _store(
            extract_triples(transcripts).withColumn(
                "pred_part", predicate_partition_col()
            )
        )
        .write.mode("overwrite")
        .partitionBy("pred_part")
        .parquet(graph_path)
    )
    index_path = os.path.join(workdir, "type_index")
    build_type_index(read_for_index(spark, graph_path)).write.mode("overwrite").parquet(index_path)
    stored = _load(spark.read.parquet(graph_path).drop("pred_part"))
    out = pseudonymize(stored, spark.read.parquet(index_path), rules, hasher)
    n = force(out.select(serialize_triple_line().alias("line")))
    return n, time.perf_counter() - t0


def run_default() -> dict:
    import tempfile

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="tripsu-bench", extra_conf=FAST_WRITE_CONF
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="tripsu-bench-")
    stages = pipeline_stages(spark, SF_DIR, workdir)
    queries: dict[str, float] = {}
    rows = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # warmup (JIT, parquet footer cache)
    stages["extract_write"]()
    for name, fn in stages.items():
        best = None
        for _ in range(reps):  # best-of-N: the sandbox is noisy
            t0 = time.perf_counter()
            rows[name] = fn()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        queries[name] = round(best, 3)
    total = round(sum(queries.values()), 3)
    e2e = queries["extract_write"] + queries["index"] + queries["pseudo"]
    triples_per_sec = int(rows["pseudo"] / e2e) if e2e else 0
    # per-stage rates make round-over-round regressions attributable
    stage_rate = {
        name: int(rows[name] / queries[name]) if queries[name] else 0
        for name in queries
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "kg_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": rows,
        "rows_per_sec": stage_rate,
        "triples_per_sec": triples_per_sec,
        "reps": reps,
        "cpus": int(CPUS),
    }
    spark.stop()
    return result


SCALE_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "4800000"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))  # N cores; 4N is the comparison
# Per-core resources: a real N-executor cluster brings N× heap and
# cores-proportional GC threads (the JVM sizes ParallelGCThreads to the
# container's cores). Threads-in-one-JVM mode must model that, or the
# small config gets the whole box's GC parallelism + heap for free.
SCALE_HEAP_PER_CORE_GB = int(os.environ.get("SPARK_GRAFT_HEAP_PER_CORE", "4"))
SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))


def scaling_rows_and_time(spark, workdir) -> tuple[int, float]:
    """Scaling-run flagship: identical to flagship_rows_and_time but on
    a seeded synthetic transcript corpus big enough that compute (not
    fixed job overhead) dominates — fixed scheduling/commit costs at
    sf0.1 (~5 s total) would swamp the parallelism signal."""
    import shutil

    from tripsu_spark.plans.lineage import predicate_partition_col, read_for_index
    from tripsu_spark.sources.transcripts import synthetic_transcripts

    transcripts = synthetic_transcripts(
        spark, n_convs=SCALE_TURNS // 10, turns_per_conv=10
    )
    hasher = Pseudonymizer.create("sha256", BENCH_SECRET)
    rules = default_rules()
    graph_path = os.path.join(workdir, "graph_raw")
    shutil.rmtree(graph_path, ignore_errors=True)
    t0 = time.perf_counter()
    (
        _store(
            extract_triples(transcripts).withColumn(
                "pred_part", predicate_partition_col()
            )
        )
        .write.mode("overwrite")
        .partitionBy("pred_part")
        .parquet(graph_path)
    )
    index_path = os.path.join(workdir, "type_index")
    build_type_index(read_for_index(spark, graph_path)).write.mode("overwrite").parquet(index_path)
    stored = _load(spark.read.parquet(graph_path).drop("pred_part"))
    out = pseudonymize(stored, spark.read.parquet(index_path), rules, hasher)
    n = force(out.select(serialize_triple_line().alias("line")))
    return n, time.perf_counter() - t0


def run_scaling_one(cores: int) -> dict:
    """One scale point, meant to run in a FRESH python process (driver
    heap is fixed at JVM launch, so per-core heap scaling requires a
    process per core count). Resources scale with cores exactly as an
    N-executor cluster's would: heap = cores × SCALE_HEAP_PER_CORE_GB,
    GC threads = cores (what the JVM picks inside a cores-sized
    container), shuffle partitions = 2 × cores."""
    import tempfile

    extra = dict(FAST_WRITE_CONF)
    if SCALE_HEAP_PER_CORE_GB > 0:
        extra["spark.driver.memory"] = f"{cores * SCALE_HEAP_PER_CORE_GB}g"
    # Cores-proportional GC threads (on by default): a real N-core
    # executor container gets N GC threads from JVM ergonomics, not this
    # box's 23. Measured at >=1.2M-turn inputs this costs local[1]
    # nothing (163.8s unpinned vs 165.5s pinned) — the tiny-input
    # distortion seen earlier does not occur at real job sizes.
    if os.environ.get("SPARK_GRAFT_GC_PROP", "1") == "1":
        extra["spark.driver.extraJavaOptions"] = (
            f"-XX:ParallelGCThreads={max(cores, 1)}"
            f" -XX:ConcGCThreads={max(cores // 4, 1)}"
        )
    codec = os.environ.get("SPARK_GRAFT_CODEC", "")
    if codec:
        extra["spark.sql.parquet.compression.codec"] = codec
    # sort-free dynamic-partition writes: each task keeps up to N open
    # part writers instead of sorting by partition value first
    cw = os.environ.get("SPARK_GRAFT_CONCURRENT_WRITERS", "")
    if cw:
        extra["spark.sql.optimizer.plannedWrite.enabled"] = "false"
        extra["spark.sql.maxConcurrentOutputFileWriters"] = cw
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"tripsu-scaling-{cores}",
        shuffle_partitions=cores * 2,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix=f"tripsu-scaling-{cores}-")
    best = None
    times = []
    n = 0
    for _ in range(SCALE_REPS):
        n, secs = scaling_rows_and_time(spark, workdir)
        times.append(round(secs, 3))
        best = min(best, secs) if best else secs
    spark.stop()
    return {
        "cores": cores,
        "rows": n,
        "sec": round(best, 3),
        "times": times,
        "rows_per_sec": int(n / best),
    }


def run_scaling() -> dict:
    """Same job, same input, local[N] vs local[4N] (default N=1), each
    scale point in its own subprocess so heap/GC scale with cores.

    Low N rather than 8-vs-32: the flagship is string/hash heavy and a
    single box's memory bandwidth saturates well below 32 threads
    (a pure-compute sha2 burn DOES scale ~7x to 32 threads — see
    BENCH.md); on a real cluster each executor brings its own
    bandwidth, which low-N-vs-4N models more faithfully while leaving
    headroom for sandbox noise."""
    import subprocess

    out = {}
    for cores in (SCALE_N, SCALE_N * 4):
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--scaling-one", str(cores)],
            capture_output=True,
            text=True,
            check=True,
        )
        out[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
    thr_n, thr_4n = out[SCALE_N]["rows_per_sec"], out[SCALE_N * 4]["rows_per_sec"]
    eff = round((thr_4n / thr_n) / 4, 3)
    report = {
        "input": f"synthetic transcripts, {SCALE_TURNS} turns (seeded, deterministic)",
        f"local{SCALE_N}": out[SCALE_N],
        f"local{SCALE_N * 4}": out[SCALE_N * 4],
        "scaling_efficiency_N_to_4N": eff,
    }
    n, n4 = SCALE_N, SCALE_N * 4
    # append a dated row to BENCH.md's Runs table (hand-authored
    # analysis above it stays intact)
    import datetime

    bench_md = Path("BENCH.md")
    if bench_md.exists() and os.environ.get("SPARK_GRAFT_NO_BENCH_MD") != "1":
        day = datetime.date.today().isoformat()
        mode = f"local[{n}] vs local[{n4}]" + (f", storage L{COMPACT}" if COMPACT else "")
        row = (
            f"| {day} | {mode} | {SCALE_TURNS} turns "
            f"| {thr_n} | {thr_4n} | {eff} |\n"
        )
        bench_md.write_text(bench_md.read_text() + row)
    return report


if __name__ == "__main__":
    if "--scaling-one" in sys.argv:
        cores_arg = int(sys.argv[sys.argv.index("--scaling-one") + 1])
        print(json.dumps(run_scaling_one(cores_arg)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_default()))
