"""tripsu-compatible CLI: the reference's two subcommands
(reference src/main.rs:76-103), re-expressed on Spark.

    # pass 1 — build the type index (tripsu: `tripsu index in.nt > idx.json`)
    python jobs/tripsu_cli.py index INPUT.nt -o INDEX_DIR

    # pass 2 — pseudonymize (tripsu: `tripsu pseudo -x idx -r rules -s secret in.nt`)
    python jobs/tripsu_cli.py pseudo INPUT.nt -x INDEX_DIR -r rules.yaml \
        [-s SECRET_FILE] [--algorithm sha256|blake3] -o OUT_DIR

Differences from the reference, by design (SURVEY.md):
- the index is a parquet table, not JSON (the JSON bytes were never a
  contract — the u64 keys are a Rust hasher artifact, SURVEY.md §1.4);
- output .nt part files are unordered (distributed write); the
  reference's output order is a single-thread artifact and triple
  semantics are set-based;
- IRIs with no '#'/'/' separator hash with an empty prefix instead of
  panicking (crypto.rs:51 divergence, documented);
- malformed input lines go to OUT_DIR/_quarantine instead of
  panicking, and are counted on stderr.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tripsu_spark.crypto import Pseudonymizer
from tripsu_spark.operators.index import build_type_index
from tripsu_spark.plans.pipeline import pseudonymize
from tripsu_spark.rules import Rules
from tripsu_spark.session import get_spark
from tripsu_spark.sources.ntriples import parse_ntriples_lines, write_ntriples


def cmd_index(args) -> int:
    spark = get_spark(app_name="tripsu-index")
    spark.sparkContext.setLogLevel("ERROR")
    parsed = parse_ntriples_lines(spark.read.text(args.input))
    triples = parsed.filter(F.col("_error").isNull()).drop("_error")
    build_type_index(triples).write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"type index: {n} subjects -> {args.output}", file=sys.stderr)
    spark.stop()
    return 0


def cmd_pseudo(args) -> int:
    spark = get_spark(app_name="tripsu-pseudo")
    spark.sparkContext.setLogLevel("ERROR")
    rules = Rules.load(args.rules)
    secret = Path(args.secret).read_bytes() if args.secret else None
    hasher = Pseudonymizer.create(args.algorithm, secret)

    parsed = parse_ntriples_lines(spark.read.text(args.input))
    bad = parsed.filter(F.col("_error").isNotNull())
    n_bad = bad.count()
    if n_bad:
        bad.select("_error").write.mode("overwrite").text(args.output + "/_quarantine")
        print(f"quarantined {n_bad} malformed lines", file=sys.stderr)
    triples = parsed.filter(F.col("_error").isNull()).drop("_error")

    index_df = (
        spark.read.parquet(args.index)
        if args.index
        else build_type_index(triples)
    )
    out = pseudonymize(triples, index_df, rules, hasher)
    write_ntriples(out, args.output + "/data", single_file=args.single_file)
    print(f"wrote {out.count()} triples -> {args.output}/data", file=sys.stderr)
    spark.stop()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(prog="tripsu-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_idx = sub.add_parser("index", help="pass 1: build the rdf:type index")
    p_idx.add_argument("input", help=".nt file or directory")
    p_idx.add_argument("-o", "--output", required=True, help="index parquet dir")

    p_ps = sub.add_parser("pseudo", help="pass 2: rule-driven pseudonymization")
    p_ps.add_argument("input", help=".nt file or directory")
    p_ps.add_argument("-x", "--index", help="index parquet dir (from `index`); built on the fly if omitted")
    p_ps.add_argument("-r", "--rules", required=True, help="rules YAML")
    p_ps.add_argument("-s", "--secret", help=">=32-byte secret file (random key if omitted)")
    p_ps.add_argument("--algorithm", default="sha256", choices=["sha256", "blake3"])
    p_ps.add_argument("--single-file", action="store_true", help="coalesce output to one part")
    p_ps.add_argument("-o", "--output", required=True, help="output dir")

    args = ap.parse_args()
    return cmd_index(args) if args.cmd == "index" else cmd_pseudo(args)


if __name__ == "__main__":
    raise SystemExit(main())
