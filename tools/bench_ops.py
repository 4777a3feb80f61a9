"""Per-operator bench: time EVERY __spark_entry__.queries() entry at a
fixed scale so round-over-round regressions in individual operators
are detectable by diffing committed artifacts (BENCH_OPS_r{N}.json),
not by re-measurement.

  python tools/bench_ops.py [sf_dir] [--reps 2] [--out BENCH_OPS.json]

Each query materializes through Spark's noop sink (full computation,
no serialization to Python, no disk write skew), best-of-``reps``.
The flagship pipeline itself is covered by bench.py; this covers the
long tail of operators bench.py doesn't touch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()
    if args.reps < 1:
        raise SystemExit("--reps must be >= 1")

    import __spark_entry__ as entry
    from tripsu_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        best = None
        rows = None
        err = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            try:
                df = fn(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # record, keep benching the rest
                err = f"{type(exc).__name__}: {exc}"[:200]
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if err is None and rows is None:
            # rows come from a separate (untimed) count so the timed
            # reps stay pure noop-sink materializations; guarded so a
            # count-shaped plan failure degrades to an err row instead
            # of aborting the whole artifact.
            try:
                rows = fn(spark, args.sf_dir).count()
            except Exception as exc:
                err = f"count: {type(exc).__name__}: {exc}"[:200]
        results[name] = (
            {"err": err, **({"sec": round(best, 3)} if best is not None else {})}
            if err is not None
            else {"sec": round(best, 3), "rows": rows}
        )
        status = results[name].get("err") or f"{results[name]['sec']:7.3f} s  {rows:>8} rows"
        print(f"{name:32s} {status}", file=sys.stderr)

    out = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "reps": args.reps,
        "queries": results,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
