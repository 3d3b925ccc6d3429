#!/bin/bash
# Load-gated clean-boot bench runner — the PERF.md protocol, executable.
#
# Usage: tools/bench_gate.sh <sfDir> <outFile>
#   e.g. tools/bench_gate.sh /root/testdata/sf0.1 BENCH_local_rN_sf0.1.json
#
# Waits until the box is genuinely quiet (1-min load < 0.35 AND 5-min
# < 1.0 — the 5-min bound matters because graft.Bench samples its
# recorded load.before ~40 s after launch, after session boot + warmup),
# then runs the full catalog once and extracts the one-line JSON.
# Run from the repo root, in tmux (waits can dominate), with the working
# tree COMMITTED (sbt compiles whatever is in the tree) and no other sbt
# process live.
set -eu
SFDIR=$1; OUT=$2
while :; do
  L1=$(cut -d' ' -f1 /proc/loadavg); L5=$(cut -d' ' -f2 /proc/loadavg)
  if awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a<0.35 && b<1.0)}'; then break; fi
  echo "waiting: load $L1/$L5 $(date +%H:%M:%S)"; sleep 30
done
echo "START $SFDIR load=$(cut -d' ' -f1,2 /proc/loadavg) $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR="$SFDIR" sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -o '{"metric".*}' > "$OUT"
echo "DONE $SFDIR -> $OUT $(date +%H:%M:%S)"
