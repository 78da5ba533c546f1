#!/bin/bash
# Round-3 final scaling campaign (one command, resumable):
#   phase A: one quiet-gated A/B pair of one-off legs on the 48M log —
#            quantifies the fast-plan engine change against the archived
#            round-3 floors (same log, same config, BENCH/scaling_r3v2*)
#   phase B: the FINAL protocol — noise+bandwidth-gated SANDWICH pairs
#            (4exec, 1exec, 4exec; efficiency vs the bracket mean) on the
#            96M log (same 5 schema events, 16M-event commit intervals —
#            nearer the >=100M-event production regime; see BASELINE.md)
# All legs, dirty legs included, land in the jsonl outputs.
set -u
# logs: tools/make_binlogs.sh regenerates /tmp/scalbench/binlog{48,96}
cd /root/repo

# phase A: one CLEAN calibration-gated pair on the 48M log (protocol
# mode retries dirty legs; calibrate now also gates on absolute
# bandwidth, so storm windows are skipped before a leg is wasted)
python tools/run_scaling_v2.py --pairs 1 --max-attempts 20 \
  --out BENCH/scaling_r3_fastplan_ab.jsonl \
  --segdir BENCH/segmetrics_r3_fastplan >> /tmp/ab_fastplan.log 2>&1

# phase B: final sandwich protocol at 96M until 6 clean pairs (or attempts run out)
python tools/run_scaling_v2.py --sandwich --log binlog96 --pairs 6 \
  --max-attempts 60 \
  --out BENCH/scaling_r3_final96.jsonl \
  --segdir BENCH/segmetrics_r3_final96 >> /tmp/final96.log 2>&1
echo "CAMPAIGN DONE" >&2
