"""Partitioned graph materialization + lineage + checkpointed resume
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; graft-specific operators table, SURVEY.md §2).

Iceberg semantics without the Iceberg jar (absent in this sandbox):
all physical table IO goes through the ``TableFormat`` seam
(plans/table_format.py) — parquet by default; the Iceberg adapter with
the exact spark-submit swap recipe is ``IcebergFormat``. Layout:

- the transcript keyspace is split into ``n_buckets`` deterministic
  conv_id buckets (xxhash64; bucket == Spark shuffle hash semantics is
  NOT assumed — the bucket is data, not placement);
- each bucket is processed and committed independently:
  ``data/bucket=<k>/`` parquet + ``_manifests/bucket-<k>.json`` with
  snapshot id, row count and an order-insensitive checksum (XOR of
  per-row xxhash64 over the canonical serialization);
- a killed job restarts and skips every bucket whose manifest exists
  (commit order: data first, manifest last, so a torn write re-runs);
- ``metrics.json`` aggregates per-bucket counts at the end.

The graph table itself is partitioned by predicate local-name —
vertical partitioning, the classic RDF-store layout: pass-1 style
scans (rdf:type only) prune to one partition.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..crypto import Pseudonymizer
from ..functions.terms import serialize_triple_line
from ..operators.extract import derived_triples, extract_triples, per_turn_triples
from ..operators.index import build_type_index
from ..rules import Rules
from .pipeline import pseudonymize
from .table_format import ParquetFormat, TableFormat


def predicate_partition_col(fine: bool = False):
    """Partition value for the stored graph table.

    Default: TWO partitions — ``type`` (rdf:type statements) vs ``data``
    (everything else). Partition by what readers actually filter on
    (guide §6): the only selective reader is pass 1
    (``read_for_index``, rdf:type only); pass 2 always reads every
    predicate. The old per-predicate vertical partitioning made every
    dynamic-partition write task keep ~14 open parquet writers and
    multiplied output files ~7x for pruning nobody used (measured at
    sf0.1: partitioned write +0.89s over flat with 14 values, +0.17s
    with 2). ``fine=True`` restores per-predicate layout for
    deployments that query single predicates.
    """
    if fine:
        local = F.element_at(F.split(F.col("predicate"), r"[#/]"), -1)
        return F.regexp_replace(local, r"[^A-Za-z0-9_\-]", "_")
    from ..operators.extract import RDF_TYPE

    return F.when(F.col("predicate") == RDF_TYPE, F.lit(RDF_TYPE_PART)).otherwise(
        F.lit("data")
    )


# Partition value predicate_partition_col() yields for rdf:type —
# pass-1 reads of a stored graph table filter on it for pruning.
RDF_TYPE_PART = "type"


def read_for_index(spark: SparkSession, graph_path: str) -> DataFrame:
    """Read ONLY the rdf:type partition of a stored graph table (the
    partition-pruned pass-1 input; `.explain` shows PartitionFilters).
    Works against both storage formats (plans/compact.py)."""
    from .compact import maybe_expand

    return maybe_expand(
        spark.read.parquet(graph_path)
        .filter(F.col("pred_part") == RDF_TYPE_PART)
        .drop("pred_part")
    )


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


# A transcript row missing any of these cannot mint valid IRIs/triples
# (null conv_id/turn_idx break the subject IRI; null role/text break
# literal objects). SURVEY §4: such rows must NOT be silently dropped —
# they are quarantined per bucket with counts in the bucket manifest.
def _invalid_transcript():
    return (
        F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | F.col("role").isNull()
        | F.col("text").isNull()
    )


def triples_checksum(triples: DataFrame) -> tuple[int, int]:
    """(row_count, order-insensitive checksum) over canonical lines."""
    row = (
        triples.select(F.xxhash64(serialize_triple_line()).alias("h"))
        .agg(F.count("*").alias("n"), F.bit_xor("h").alias("checksum"))
        .collect()[0]
    )
    return int(row["n"]), int(row["checksum"] or 0)


class GraphTableWriter:
    """Bucketed, resumable two-pass pipeline runner with an Iceberg-style
    snapshot log.

    Each COMPLETED run commits a snapshot: ``_snapshots/<seq>-<id>.json``
    records every bucket's data path, row count, checksum, quarantine
    count, and the PHYSICAL schema written (snapshots may differ —
    e.g. standard vs prefix-compacted storage; ``read`` restores the
    same logical frame either way). ``run(overwrite=True)`` starts a new
    table version in ``data/v<seq>/`` instead of resuming; ``read(
    as_of=<snapshot_id>)`` time-travels to any committed snapshot.
    Version 1 keeps the bare ``data/bucket=<k>`` layout so existing
    tables/readers are unaffected.
    """

    def __init__(
        self,
        base_path: str,
        n_buckets: int = 8,
        table_format: TableFormat | None = None,
    ):
        self.base_path = base_path
        self.n_buckets = n_buckets
        # Physical-format seam (plans/table_format.py): every table
        # read/write below goes through this adapter; swapping parquet
        # for Iceberg is a constructor argument, not a rewrite. JSON
        # manifests/snapshots/quarantine are writer-side control data,
        # not table data, and stay on the filesystem in either format.
        self.fmt = table_format if table_format is not None else ParquetFormat()
        self.snapshot_dir = os.path.join(base_path, "_snapshots")
        os.makedirs(self.snapshot_dir, exist_ok=True)
        self._set_version(self._latest_version())

    # ------------------------------------------------------------ versions

    def _latest_version(self) -> int:
        vmax = 1
        data = os.path.join(self.base_path, "data")
        if os.path.isdir(data):
            for name in os.listdir(data):
                if name.startswith("v") and name[1:].isdigit():
                    vmax = max(vmax, int(name[1:]))
        return vmax

    def _set_version(self, version: int) -> None:
        self.version = version
        sub = "" if version == 1 else f"v{version}"
        self.data_dir = os.path.join(self.base_path, "data", sub) if sub else os.path.join(self.base_path, "data")
        self.manifest_dir = os.path.join(self.base_path, "_manifests", sub) if sub else os.path.join(self.base_path, "_manifests")
        self.quarantine_dir = os.path.join(self.base_path, "_quarantine", sub) if sub else os.path.join(self.base_path, "_quarantine")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ------------------------------------------------------------ snapshots

    def snapshots(self) -> list[dict]:
        """Committed snapshots, oldest first."""
        out = []
        for name in sorted(os.listdir(self.snapshot_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.snapshot_dir, name)) as fh:
                    out.append(json.load(fh))
        return out

    def _commit_snapshot(self, snapshot_id: str, schema_json: str) -> None:
        buckets = {}
        for b in sorted(self.committed_buckets(), key=str):
            with open(self._manifest_path(b)) as fh:
                m = json.load(fh)
            buckets[str(b)] = {
                "path": os.path.relpath(
                    os.path.join(self.data_dir, f"bucket={b}"), self.base_path
                ),
                "row_count": m["row_count"],
                "checksum": m["checksum"],
                "quarantined": m.get("quarantined", 0),
            }
        seq = len(self.snapshots()) + 1
        _atomic_write_json(
            os.path.join(self.snapshot_dir, f"{seq:06d}-{snapshot_id}.json"),
            {
                "snapshot_id": snapshot_id,
                "sequence": seq,
                "version": self.version,
                "schema": schema_json,
                "buckets": buckets,
            },
        )

    def _manifest_path(self, bucket) -> str:
        return os.path.join(self.manifest_dir, f"bucket-{bucket}.json")

    def committed_buckets(self) -> set:
        out: set = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("bucket-") and name.endswith(".json"):
                raw = name[len("bucket-"):-len(".json")]
                out.add(int(raw) if raw.isdigit() else raw)
        return out

    def run(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        rules: Rules,
        hasher: Pseudonymizer,
        snapshot_id: str | None = None,
        fail_after_bucket: int | None = None,
        overwrite: bool = False,
        store_compact: bool | int = False,
    ) -> dict:
        """Process every uncommitted bucket; returns metrics dict.

        ``fail_after_bucket`` injects a crash for the resume test.
        The global type index is built over ALL transcripts first (pass
        1 must see every rdf:type statement regardless of bucket) and
        persisted once as the pass-2 broadcast side.

        ``overwrite=True`` starts a NEW table version (fresh data dirs;
        prior snapshots stay readable via ``read(as_of=...)``).
        ``store_compact`` stores this version compacted
        (plans/compact.py; True/1 = prefix codes, 2 = + dictionary-coded
        kind/predicate/datatype tinyints) — a PHYSICAL schema change;
        ``read`` restores the identical logical frame, and checksums are
        computed on the logical frame so they are storage-format-invariant.
        """
        snapshot_id = snapshot_id or f"snap-{int(time.time() * 1000)}"
        if overwrite and (self.committed_buckets() or self.snapshots()):
            self._set_version(self.version + 1)

        # Split valid/quarantine ONCE; every pass below sees valid rows
        # only, and malformed rows land in _quarantine/bucket=<k> with
        # per-bucket counts in the manifests (audit trail, SURVEY §4).
        valid = transcripts.filter(~_invalid_transcript())

        index_path = os.path.join(
            self.base_path,
            "type_index" if self.version == 1 else f"type_index_v{self.version}",
        )
        index_manifest = os.path.join(self.manifest_dir, "type_index.json")
        if not os.path.exists(index_manifest):
            index_df = build_type_index(extract_triples(valid))
            self.fmt.write(index_df, index_path)
            n = self.fmt.read(spark, index_path).count()
            _atomic_write_json(index_manifest, {
                "snapshot_id": snapshot_id, "rows": n, "stage": "pass1"
            })
        index_df = self.fmt.read(spark, index_path)

        done = self.committed_buckets()
        # A table version must be one physical layout: resuming with a
        # different --store-compact than the committed buckets would
        # write mixed schemas into one version and read() would return
        # silently wrong triples (schema union, no error). Refuse.
        for b in sorted(done, key=str):
            with open(self._manifest_path(b)) as fh:
                committed_level = json.load(fh).get("storage_level")
            if committed_level is None:
                # Legacy manifest (committed before storage_level was
                # recorded): the key's absence does NOT mean level 0 —
                # sniff the committed bucket's physical parquet schema
                # for the compact-storage marker columns instead of
                # guessing (a level-1 table misread as 0 would refuse
                # its own correct resume and steer the operator toward
                # appending level-0 buckets into a level-1 version).
                cols = self.fmt.read(
                    spark, os.path.join(self.data_dir, f"bucket={b}")
                ).columns
                committed_level = 2 if "s_kc" in cols else 1 if "s_pfx" in cols else 0
            if committed_level != int(store_compact):
                raise ValueError(
                    f"resume storage-level mismatch: bucket {b} of this table "
                    f"version was committed at storage level {committed_level}, "
                    f"but this run requested {int(store_compact)}; rerun with "
                    f"store_compact={committed_level}, or start a new version "
                    f"with overwrite=True"
                )
            break  # all buckets of a version share one level; checking one suffices
        metrics: dict = {"snapshot_id": snapshot_id, "buckets": {}, "skipped": sorted(done, key=str)}
        # null conv_id (a quarantine case) hashes to bucket 0 so every
        # malformed row still has a deterministic home bucket.
        bucketed = transcripts.withColumn(
            "_bucket", F.coalesce(bucket_col(self.n_buckets), F.lit(0))
        )

        # Per-turn triples are conversation-local -> one bucket each.
        # Derived triples (entity typing, link scores) are GLOBAL facts
        # and get their own single commit, so the union over all
        # commits equals extract_triples(all) exactly regardless of
        # n_buckets (no cross-bucket duplicate type rows).
        units: list[tuple[int | str, object, object]] = [
            (
                b,
                per_turn_triples(
                    bucketed.filter(
                        (F.col("_bucket") == b) & ~_invalid_transcript()
                    ).drop("_bucket")
                ),
                bucketed.filter(
                    (F.col("_bucket") == b) & _invalid_transcript()
                ).drop("_bucket"),
            )
            for b in range(self.n_buckets)
        ]
        units.append(("derived", derived_triples(valid), None))

        for bucket, triples, quarantine in units:
            if bucket in done:
                continue
            out = pseudonymize(triples, index_df, rules, hasher).withColumn(
                "pred_part", predicate_partition_col()
            )
            if store_compact:
                from .compact import compact_triples

                # pred_part is computed BEFORE compaction (level 2
                # dictionary-codes the predicate column away); it passes
                # through compact_triples untouched.
                out = compact_triples(out, level=int(store_compact))
            data_path = os.path.join(self.data_dir, f"bucket={bucket}")
            self.fmt.write(out, data_path, partition_by=["pred_part"])
            n_bad = 0
            if quarantine is not None:
                q_path = os.path.join(self.quarantine_dir, f"bucket={bucket}")
                quarantine.write.mode("overwrite").json(q_path)
                n_bad = spark.read.json(q_path).count() if _has_data(q_path) else 0
            from .compact import maybe_expand

            n, checksum = triples_checksum(
                maybe_expand(self.fmt.read(spark, data_path).drop("pred_part"))
            )
            _atomic_write_json(self._manifest_path(bucket), {
                "snapshot_id": snapshot_id,
                "partition_id": bucket,
                "row_count": n,
                "checksum": checksum,
                "quarantined": n_bad,
                "storage_level": int(store_compact),
            })
            metrics["buckets"][str(bucket)] = {
                "rows": n, "checksum": checksum, "quarantined": n_bad
            }
            if (
                fail_after_bucket is not None
                and isinstance(bucket, int)
                and bucket >= fail_after_bucket
            ):
                raise RuntimeError(f"injected failure after bucket {bucket}")

        total = sum(m["rows"] for m in metrics["buckets"].values())
        total_bad = sum(m["quarantined"] for m in metrics["buckets"].values())
        for b in sorted(done, key=str):
            with open(self._manifest_path(b)) as fh:
                manifest = json.load(fh)
            total += manifest["row_count"]
            total_bad += manifest.get("quarantined", 0)
        metrics["total_rows"] = total
        metrics["total_quarantined"] = total_bad
        _atomic_write_json(os.path.join(self.base_path, "metrics.json"), metrics)
        # run completed -> commit a snapshot (skip pure no-op resumes so
        # an idempotent re-run doesn't duplicate the log)
        snaps = self.snapshots()
        if metrics["buckets"] or not any(s["version"] == self.version for s in snaps):
            sample = self.fmt.read(
                spark,
                os.path.join(self.data_dir, f"bucket={self.n_buckets - 1 if self.n_buckets else 0}"),
            )
            self._commit_snapshot(snapshot_id, sample.drop("pred_part").schema.json())
        return metrics

    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame:
        """Logical triple frame of the latest snapshot, or time-travel
        to ``as_of=<snapshot_id>``. Physical schema differences between
        snapshots (e.g. compact vs standard storage) are resolved here —
        callers always get the same logical columns."""
        from .compact import maybe_expand

        snaps = self.snapshots()
        if not snaps:
            # No committed snapshot yet. Mid-run: read the buckets the
            # manifests vouch for, through the format seam (a non-
            # directory format has no "<base>/data" umbrella table to
            # read — only per-bucket tables exist). Legacy tables with
            # neither snapshots nor manifests fall back to the direct
            # parquet-layout read.
            done = self.committed_buckets()
            if done:
                paths = [
                    os.path.join(self.data_dir, f"bucket={b}")
                    for b in sorted(done, key=str)
                ]
                return maybe_expand(
                    self.fmt.read_union(spark, paths, self.data_dir)
                    .drop("pred_part", "bucket")
                )
            return maybe_expand(
                self.fmt.read(spark, os.path.join(self.base_path, "data"))
                .drop("pred_part", "bucket")
            )
        if as_of is None:
            snap = snaps[-1]
        else:
            matching = [s for s in snaps if s["snapshot_id"] == as_of]
            if not matching:
                known = [s["snapshot_id"] for s in snaps]
                raise ValueError(f"unknown snapshot {as_of!r}; committed: {known}")
            snap = matching[-1]
        paths = [os.path.join(self.base_path, b["path"]) for b in snap["buckets"].values()]
        # all buckets of one snapshot share a version data dir; an
        # empty-bucket snapshot reaches read_union's descriptive error
        base = os.path.dirname(paths[0]) if paths else self.data_dir
        return maybe_expand(
            self.fmt.read_union(spark, paths, base).drop("pred_part", "bucket")
        )


def _has_data(path: str) -> bool:
    """True if a written json/parquet dir contains any part files with
    bytes (an all-empty-partition write yields only a _SUCCESS marker,
    which spark.read.json cannot infer a schema from)."""
    try:
        return any(
            f.startswith("part-") and os.path.getsize(os.path.join(path, f)) > 0
            for f in os.listdir(path)
        )
    except FileNotFoundError:
        return False


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)
