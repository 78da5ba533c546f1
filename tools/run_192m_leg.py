"""Round-5 stretch (r4 verdict item 8): ONE 192M-event 4-exec leg to
validate the 10^10 cost model's linear extrapolation at a 2x scale point.

The round-4 cost model (BENCH/BASELINE.md "Round-4 cost model") was built
from the 96M v3.x measurements. Its three load-bearing per-event /
per-commit constants, and what a 2x log (binlog192: 192M events, 9.6M
docs, same generator params otherwise, so identical per-event character)
must measure if the model extrapolates linearly:

  - 4-exec data wall: v3.4 clean pairs measured t4_data 296.2 / 341.6 s
    on 97.9M events -> 3.03-3.49 us/event -> PREDICTED 593-683 s for
    195.8M events (2x event count; state 2x but the fold is bucket-local
    and state-size-independent per event, so no superlinear term).
  - shuffle volume: ~90 B/event after the map-local LWW precombine
    (seg0 of binlog96: 3.1 GB / 34.3M events) -> PREDICTED ~17.6 GB
    total exchange write for the whole replay.
  - serial commit floor: ~1.3-1.5 s/commit (driver turn + manifest +
    lineage), O(1) in table size -> PREDICTED unchanged at 2x.

Protocol: same worker shape as the v3 campaigns (local-cluster[4,1,6144],
per-JVM-equal 400k*e warmup, plan untimed, stepped replay, per-step
walls) with the Spark event log on so the shuffle-bytes claim is read
from task metrics, not inferred. Opens behind the host-calibration gate;
/proc/stat + bandwidth-probe noise is recorded and the leg is flagged
clean/dirty by the same pre-registered v2 gates. One leg, reported
regardless of outcome.

Usage: python tools/run_192m_leg.py [--out BENCH/scaling_r5_192m.jsonl]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling_v2 import (  # noqa: E402
    LOCALDIR, STORAGE, BwProbe, Sampler, calibrate, leg_clean,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS, N_DOCS = 192_000_000, 9_600_000
PREDICTED = {
    "t4_data_s": [593.0, 683.0],     # 2x the clean v3.4 t4_data walls
    "shuffle_bytes_per_event": 90.0,  # precombined exchange density
    "commit_floor_s": [1.3, 1.5],
}


def ensure_binlog(path: str) -> None:
    if os.path.isdir(path):
        return
    sys.stderr.write(f"generating binlog192 at {path} (~26 GB)...\n")
    from agr_loader_spark.generator import generate_binlog
    from agr_loader_spark.session import get_spark

    spark = get_spark("gen192", cores=24, master="local[24]")
    # 250k-event generation tasks: same loopback-TCP-hang workaround as
    # tools/make_binlogs.sh (content is partition-invariant)
    generate_binlog(spark, n_events=N_EVENTS, n_docs=N_DOCS,
                    epoch_size=N_EVENTS, seed=42,
                    partitions=4 * 192).write.partitionBy(
        "epoch").parquet(path)
    spark.stop()


def run_leg_192(log: str, eventdir: str) -> dict:
    from agr_loader_spark.generator import generate_binlog
    from agr_loader_spark.lake.table import LakeTable
    from agr_loader_spark.schema import TOKENS_MERGE_KEY, TOKENS_TABLE_COLUMNS
    from agr_loader_spark.session import get_spark
    from agr_loader_spark.streaming.runner import ReplayRunner

    e = 4
    base, local = STORAGE["disk"], LOCALDIR["disk"]
    os.makedirs(eventdir, exist_ok=True)
    for f in glob.glob(os.path.join(eventdir, "*")):
        shutil.rmtree(f, ignore_errors=True) if os.path.isdir(f) else os.remove(f)
    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    extra.update({"spark.eventLog.enabled": "true",
                  "spark.eventLog.dir": eventdir})
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(extra)
    os.environ["SPARK_LOCAL_DIRS_OVERRIDE"] = local
    shutil.rmtree(local, ignore_errors=True)

    spark = get_spark(f"leg192-{e}", cores=e,
                      master=f"local-cluster[{e},1,6144]")
    subprocess.run(f"cat {log}/*/*.parquet > /dev/null 2>&1", shell=True)
    # per-JVM-equal steady-state warmup (v3.1 protocol)
    we = 400_000 * e
    wdir = tempfile.mkdtemp(prefix="w192_")
    wt = LakeTable.create(spark, os.path.join(wdir, "t"),
                          TOKENS_TABLE_COLUMNS, key=TOKENS_MERGE_KEY,
                          n_buckets=64)
    wlog = generate_binlog(spark, n_events=we, n_docs=we // 8,
                           epoch_size=we // 2, seed=7)
    ReplayRunner(spark, wt, source_df=wlog, sink="arrow").run()
    shutil.rmtree(wdir, ignore_errors=True)

    tdir = os.path.join(base, "t192")
    shutil.rmtree(tdir, ignore_errors=True)
    table = LakeTable.create(spark, tdir, TOKENS_TABLE_COLUMNS,
                             key=TOKENS_MERGE_KEY, n_buckets=64)
    runner = ReplayRunner(spark, table, source_path=log, salt_buckets=16,
                          sink="arrow", pipeline=False)
    tp = time.monotonic()
    planobj = runner.plan()
    plan_s = round(time.monotonic() - tp, 2)

    sampler = Sampler()
    sampler.start()
    bw = BwProbe()
    bw.start()
    steps, t_leg = [], time.monotonic()
    while True:
        before = table.snapshot_id
        t0 = time.monotonic()
        metrics = runner.run(stop_after=1, plan=planobj)
        wall = time.monotonic() - t0
        if table.snapshot_id == before:
            break
        m = [x for x in metrics if not x.get("skipped")][-1]
        is_schema = m.get("operation", "").startswith("evolve")
        steps.append({
            "wall": round(wall, 3), "epoch_key": m.get("epoch_key"),
            "n_events": int(m.get("n_events", 0) or 0),
            "op": "schema" if is_schema else "data",
            "sec_job": m.get("sec_job"),
        })
        sys.stderr.write(f"STEP {len(steps)-1}: {steps[-1]}\n")
    leg_wall = round(time.monotonic() - t_leg, 2)
    noise = sampler.stop()
    noise.update(bw.stop())
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.copy(os.path.join(tdir, "_metrics.jsonl"),
                os.path.join(REPO, "BENCH", "segmetrics_r5_192m.jsonl"))
    shutil.rmtree(tdir, ignore_errors=True)
    shutil.rmtree(local, ignore_errors=True)

    clean, reasons = leg_clean(e, noise)
    shuf = parse_eventlog_shuffle(eventdir, app_id)
    return {"executors": e, "steps": steps, "leg_wall_s": leg_wall,
            "plan_s": plan_s, "noise": noise, "clean": clean,
            "dirty_reasons": reasons, **shuf}


def parse_eventlog_shuffle(eventdir: str, app_id: str) -> dict:
    path = os.path.join(eventdir, app_id)
    if not os.path.exists(path):
        cands = glob.glob(os.path.join(eventdir, f"*{app_id}*"))
        if not cands:
            return {"shuffle_write_bytes": None}
        path = cands[0]

    def _lines(p):
        files = [p]
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "events_*")))
        for f in files:
            if f.endswith(".zstd"):
                out = subprocess.run(["zstd", "-d", "-c", f],
                                     capture_output=True, text=True).stdout
                yield from out.splitlines()
            else:
                yield from open(f)

    wr = rd = inp = 0
    for line in _lines(path):
        if '"SparkListenerTaskEnd"' not in line:
            continue
        ev = json.loads(line)
        tm = ev.get("Task Metrics") or {}
        sw = tm.get("Shuffle Write Metrics") or {}
        wr += sw.get("Shuffle Bytes Written", 0)
        sr = tm.get("Shuffle Read Metrics") or {}
        rd += sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
        im = tm.get("Input Metrics") or {}
        inp += im.get("Bytes Read", 0)
    return {"shuffle_write_bytes": wr, "shuffle_read_bytes": rd,
            "input_bytes": inp}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/scaling_r5_192m.jsonl")
    ap.add_argument("--eventdir", default="/tmp/eventlog_192m")
    ap.add_argument("--cal-retries", type=int, default=10)
    args = ap.parse_args()
    out = os.path.join(REPO, args.out)
    log = os.path.join(STORAGE["disk"], "binlog192")
    ensure_binlog(log)

    cal = calibrate()
    waits = 0
    while cal is None and waits < args.cal_retries:
        ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        sys.stderr.write(f"{ts} calibration gate closed, waiting\n")
        time.sleep(90)
        waits += 1
        cal = calibrate()

    rec = run_leg_192(log, args.eventdir)
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    rec["calibration"] = cal
    rec["gate_opened"] = cal is not None

    data = [s for s in rec["steps"] if s["op"] == "data"]
    n_ev = sum(s["n_events"] for s in data)
    t_data = round(sum(s["wall"] for s in data), 2)
    commit_overheads = sorted(
        round(s["wall"] - s["sec_job"], 3) for s in data if s["sec_job"]
    )
    med_commit = commit_overheads[len(commit_overheads) // 2] if commit_overheads else None
    spe = round(rec["shuffle_write_bytes"] / n_ev, 1) if (
        rec.get("shuffle_write_bytes") and n_ev) else None
    rec["validation"] = {
        "n_events": n_ev,
        "t4_data_s": t_data,
        "t4_data_predicted_s": PREDICTED["t4_data_s"],
        "shuffle_bytes_per_event": spe,
        "shuffle_bytes_per_event_predicted": PREDICTED["shuffle_bytes_per_event"],
        "commit_overhead_s_median": med_commit,
        "commit_overheads_s": commit_overheads,
        "commit_floor_predicted_s": PREDICTED["commit_floor_s"],
    }
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec["validation"], indent=1))
    print(json.dumps({"clean": rec["clean"],
                      "dirty_reasons": rec["dirty_reasons"],
                      "leg_wall_s": rec["leg_wall_s"],
                      "plan_s": rec["plan_s"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
