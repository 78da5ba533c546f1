"""A/B replay harness for bisecting local[32] replay throughput.

Replays a pinned binlog (same parquet files for every code version under
test) into a fresh LakeTable per rep and prints per-rep walls + median as
one JSON line. Run from the repo/worktree whose code you want to measure:

    python tools/ab_replay.py --binlog /tmp/abbench/binlog4m --reps 3
    python tools/ab_replay.py --binlog /tmp/abbench/binlog4m --pipeline

Generate the pinned binlog once (HEAD generator, includes the r3 drop/
re-add schema events):

    python tools/ab_replay.py --generate --binlog /tmp/abbench/binlog4m

The verdict-r3 regression reproduction shape: 4M events, 400k docs,
epoch_size=2M, 64 buckets, local[32], fresh table per rep, warm pass first.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--binlog", default="/tmp/abbench/binlog4m")
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--precombine", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="map-LOCAL LWW combine before the bucket shuffle; "
                         "default None = runner default (ON for arrow sink); "
                         "--no-precombine forces it off")
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--label", default="")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--master", default=None,
                    help="e.g. local-cluster[4,1,6144] for the multi-JVM "
                         "scaling shape; default local[--cores]")
    args = ap.parse_args()

    from agr_loader_spark.generator import generate_binlog
    from agr_loader_spark.lake.table import LakeTable
    from agr_loader_spark.schema import TOKENS_MERGE_KEY, TOKENS_TABLE_COLUMNS
    from agr_loader_spark.session import get_spark
    from agr_loader_spark.streaming.runner import ReplayRunner

    spark = get_spark("ab_replay", cores=args.cores, master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate:
        if os.path.exists(args.binlog):
            print(f"exists: {args.binlog}", file=sys.stderr)
            return 0
        generate_binlog(spark, n_events=args.events, n_docs=args.events // 10,
                        epoch_size=max(args.events // 2, 1), seed=42
                        ).write.partitionBy("epoch").parquet(args.binlog)
        print(f"generated: {args.binlog}", file=sys.stderr)
        return 0

    work = tempfile.mkdtemp(prefix="ab_replay_")
    try:
        # warm pass: plan + JIT + page cache
        wt = LakeTable.create(spark, os.path.join(work, "warm"),
                              TOKENS_TABLE_COLUMNS, key=TOKENS_MERGE_KEY,
                              n_buckets=64)
        ReplayRunner(spark, wt, source_df=generate_binlog(
            spark, n_events=300_000, n_docs=30_000, epoch_size=150_000,
            seed=7)).run()

        reps, n_events = [], 0
        for rep in range(args.reps):
            table = LakeTable.create(
                spark, os.path.join(work, f"tokens{rep}"),
                TOKENS_TABLE_COLUMNS, key=TOKENS_MERGE_KEY, n_buckets=64)
            kwargs = {}
            if args.pipeline:
                kwargs["pipeline"] = True
            if args.precombine is not None:
                kwargs["precombine"] = args.precombine
            runner = ReplayRunner(spark, table, source_path=args.binlog,
                                  **kwargs)
            t0 = time.monotonic()
            metrics = runner.run()
            reps.append(round(time.monotonic() - t0, 3))
            n_events = sum(m.get("n_events", 0) for m in metrics
                           if not m.get("skipped"))
    finally:
        shutil.rmtree(work, ignore_errors=True)

    med = statistics.median(reps)
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    print(json.dumps({
        "label": args.label or sha, "sha": sha, "pipeline": args.pipeline,
        "precombine": args.precombine, "master": args.master,
        "reps": reps, "median": med, "n_events": n_events,
        "events_per_sec": round(n_events / med, 1), "cores": args.cores,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
