"""Diagnose the segment-0 scaling anomaly seen in the v3 interleaved runs.

v3 pairs 1-2 (BENCH/scaling_r4_interleaved.jsonl) both show the initial
table-build segment (epoch 0:0, 34.3M events into an empty table) scaling
at ~0.49 from 1 to 4 executors while every steady-state segment lands
0.78-1.04. Per-event the 1-exec leg is FASTER on segment 0 than segment 2
(no state to read), so the anomaly is specific to the 4-exec run of the
first commit.

This script replays steps 0..2 (data 0:0, schema 0:1, data 0:2) of the
same 96M log on the same local-cluster[4,1,6144] config with the Spark
event log enabled, then parses the event log and prints per-stage
duration / shuffle bytes / spill / GC so the extra ~80-120 s in segment 0
has a name.

Usage: python tools/diag_seg0.py [--executors 4] [--steps 3] \
           [--log /tmp/scalbench/binlog96]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--executors", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--log", default="/tmp/scalbench/binlog96")
    ap.add_argument("--eventdir", default="/tmp/diag_eventlog")
    ap.add_argument("--skip-warmup", action="store_true")
    ap.add_argument("--precombine", action="store_true",
                    help="map-side LWW combine before the bucket shuffle")
    ap.add_argument("--warmup-events", type=int, default=400_000,
                    help="warmup replay size; the campaign default 400k "
                         "splits across e JVMs, so each 4-exec JVM enters "
                         "segment 0 ~4x colder (JIT) than the 1-exec JVM — "
                         "pass 1_600_000 to test per-JVM-equal warmup")
    args = ap.parse_args()

    os.makedirs(args.eventdir, exist_ok=True)
    for f in glob.glob(os.path.join(args.eventdir, "*")):
        os.remove(f)

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    extra.update({
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": args.eventdir,
    })
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(extra)

    from agr_loader_spark.generator import generate_binlog
    from agr_loader_spark.lake.table import LakeTable
    from agr_loader_spark.schema import TOKENS_MERGE_KEY, TOKENS_TABLE_COLUMNS
    from agr_loader_spark.session import get_spark
    from agr_loader_spark.streaming.runner import ReplayRunner

    e = args.executors
    spark = get_spark(f"diag-seg0-{e}", cores=e,
                      master=f"local-cluster[{e},1,6144]")
    # page-cache pre-warm (the campaign does this before every pair)
    import subprocess
    subprocess.run(f"cat {args.log}/*/*.parquet > /dev/null 2>&1", shell=True)
    if not args.skip_warmup:
        we = args.warmup_events
        wdir = tempfile.mkdtemp(prefix="diagwarm_")
        wt = LakeTable.create(spark, os.path.join(wdir, "t"),
                              TOKENS_TABLE_COLUMNS, key=TOKENS_MERGE_KEY,
                              n_buckets=64)
        wlog = generate_binlog(spark, n_events=we, n_docs=we // 8,
                               epoch_size=we // 2, seed=7)
        ReplayRunner(spark, wt, source_df=wlog, sink="arrow").run()
        shutil.rmtree(wdir, ignore_errors=True)

    tdir = tempfile.mkdtemp(prefix=f"diagtab_{e}_")
    table = LakeTable.create(spark, os.path.join(tdir, "t"),
                             TOKENS_TABLE_COLUMNS, key=TOKENS_MERGE_KEY,
                             n_buckets=64)
    runner = ReplayRunner(spark, table, source_path=args.log,
                          salt_buckets=16, sink="arrow", pipeline=False,
                          precombine=args.precombine)
    planobj = runner.plan()
    walls = []
    for s in range(args.steps):
        t0 = time.monotonic()
        metrics = runner.run(stop_after=1, plan=planobj)
        w = time.monotonic() - t0
        m = [x for x in metrics if not x.get("skipped")][-1]
        walls.append({"step": s, "wall": round(w, 2),
                      "epoch_key": m.get("epoch_key"),
                      "n_events": int(m.get("n_events", 0) or 0),
                      "sec_job": m.get("sec_job")})
        print(f"STEP {s}: {walls[-1]}", flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.rmtree(tdir, ignore_errors=True)

    # ------------------------------------------------------------ parse
    path = os.path.join(args.eventdir, app_id)
    if not os.path.exists(path):
        # Spark 4 rolling event log: a directory of zstd-compressed parts
        cands = glob.glob(os.path.join(args.eventdir, f"*{app_id}*"))
        path = cands[0] if cands else path
    stages = {}       # sid -> agg
    stage_names = {}
    job_stages = {}   # job id -> [stage ids]
    job_times = {}
    def _lines(p):
        files = [p]
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "events_*")))
        for f in files:
            if f.endswith(".zstd"):
                import subprocess
                out = subprocess.run(["zstd", "-d", "-c", f],
                                     capture_output=True, text=True).stdout
                yield from out.splitlines()
            else:
                yield from open(f)

    for line in _lines(path):
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            job_stages[ev["Job ID"]] = [s["Stage ID"] for s in ev["Stage Infos"]]
            job_times[ev["Job ID"]] = [ev.get("Submission Time", 0), None]
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in job_times:
                job_times[ev["Job ID"]][1] = ev.get("Completion Time", 0)
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stage_names[si["Stage ID"]] = si["Stage Name"].split("\n")[0]
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            a = stages.setdefault(sid, {
                "n": 0, "run_ms": 0, "gc_ms": 0, "cpu_ms": 0,
                "shuf_read_mb": 0.0, "shuf_write_mb": 0.0,
                "spill_mem_mb": 0.0, "spill_disk_mb": 0.0,
                "input_mb": 0.0, "deser_ms": 0, "fetch_wait_ms": 0,
                "write_time_ms": 0, "max_task_ms": 0,
                "py_total_ms": 0, "py_boot_ms": 0,
            })
            a["n"] += 1
            rt = tm.get("Executor Run Time", 0)
            a["run_ms"] += rt
            a["max_task_ms"] = max(a["max_task_ms"], rt)
            a["gc_ms"] += tm.get("JVM GC Time", 0)
            a["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
            a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            sr = tm.get("Shuffle Read Metrics") or {}
            a["shuf_read_mb"] += (sr.get("Local Bytes Read", 0)
                                  + sr.get("Remote Bytes Read", 0)) / 1e6
            a["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            sw = tm.get("Shuffle Write Metrics") or {}
            a["shuf_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            a["write_time_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
            a["spill_mem_mb"] += tm.get("Memory Bytes Spilled", 0) / 1e6
            a["spill_disk_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6
            im = tm.get("Input Metrics") or {}
            a["input_mb"] += im.get("Bytes Read", 0) / 1e6
            for acc in (ev.get("Task Info") or {}).get("Accumulables", []):
                nm = acc.get("Name") or ""
                try:
                    upd = int(acc.get("Update", 0))
                except (TypeError, ValueError):
                    continue
                if nm == "pythonTotalTime":  # pandas UDF worker time (ms)
                    a["py_total_ms"] += upd
                elif nm == "pythonBootTime":
                    a["py_boot_ms"] += upd

    print("\n==== jobs ====")
    for j in sorted(job_times):
        sub, comp = job_times[j]
        dur = (comp - sub) / 1000 if comp else None
        print(f"job {j}: {dur if dur is not None else '?'}s stages={job_stages[j]}")
    print("\n==== stages (completed, by wall contribution) ====")
    for sid in sorted(stages):
        a = stages[sid]
        nm = stage_names.get(sid, "?")[:70]
        print(f"stage {sid:3d} n={a['n']:4d} run={a['run_ms']/1000:8.1f}s "
              f"cpu={a['cpu_ms']/1000:8.1f}s gc={a['gc_ms']/1000:6.1f}s "
              f"maxtask={a['max_task_ms']/1000:6.1f}s "
              f"in={a['input_mb']:7.0f}MB sr={a['shuf_read_mb']:7.0f}MB "
              f"sw={a['shuf_write_mb']:7.0f}MB wt={a['write_time_ms']/1000:5.1f}s "
              f"fw={a['fetch_wait_ms']/1000:5.1f}s "
              f"spill={a['spill_disk_mb']:6.0f}MB "
              f"py={a['py_total_ms']/1000:7.1f}s boot={a['py_boot_ms']/1000:5.1f}s"
              f"  {nm}")
    print("\nWALLS:", json.dumps(walls))
    print("event log:", path)


if __name__ == "__main__":
    main()
