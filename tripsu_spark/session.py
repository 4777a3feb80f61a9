"""SparkSession factory with scale-appropriate defaults.

AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (every pandas UDF hop is batched), shuffle
partitions sized for the local harness (32 cores) — on a real cluster
set spark.sql.shuffle.partitions ~ 2-3x total cores and let AQE
coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": "8g",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # This engine's scans are CPU-heavy (regex, hashing, serialization)
    # over well-compressed string parquet: default 128 MB splits starve
    # the cores (a 60 MB table = 9M triples would scan in <=8 tasks).
    # Smaller splits keep every core busy; AQE re-coalesces shuffles.
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(512 * 1024),
}

# v2 commits rename task output during (parallel) task commit instead
# of serially on the driver at job commit — the serial v1 rename loop
# is pure fixed overhead that grows with file count and dilutes scaling
# on short jobs. The trade-off: a failed/partial job can leave partial
# output visible (v1 is atomic at job commit), so v2 is NOT a session
# default — bench/scaling entry points opt in via
# ``get_spark(extra_conf=FAST_WRITE_CONF)``; user-facing paths (CLI,
# GraphTableWriter) keep the safe v1 committer, and the lineage layer's
# manifest-last commit protocol makes torn writes re-runnable anyway.
FAST_WRITE_CONF = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
}


# Keys the cluster launcher owns in spark-submit entry points (driver
# memory via --driver-memory, UI per cluster policy) — everything else
# in DEFAULTS is engine semantics and applies everywhere.
SUBMIT_EXCLUDED = ("spark.driver.memory", "spark.ui.enabled")


def get_submit_spark(app_name: str) -> SparkSession:
    """Session for spark-submit entry points (jobs/*.py): engine
    defaults applied, master and driver resources left to the
    launcher. Single source of truth — job scripts must not re-apply
    DEFAULTS by hand."""
    builder = SparkSession.builder.appName(app_name)
    for k, v in DEFAULTS.items():
        if k not in SUBMIT_EXCLUDED:
            builder = builder.config(k, v)
    return builder.getOrCreate()


def get_spark(
    master: str | None = None,
    app_name: str = "tripsu-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.master(master or f"local[{cpus}]").appName(app_name)
    conf = dict(DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
