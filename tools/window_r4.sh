#!/bin/bash
# TPU-free-window worker (round 4): the moment corpus generation finishes,
# the launch_r4 chain spends ~1 h building host prep caches on the CPU —
# the chip is idle.  Use that window for the two remaining VERDICT items
# that need an uncontended chip:
#   #4  batch-monotonicity sweep  -> results/batch_sweep_r4.jsonl
#   #5  xprof kernel trace        -> results/xprof_r4/op_table.json
# Both are time-boxed well inside the prebuild hour so they cannot contend
# with the training watchdog's cache upload.
#
#   nohup tools/window_r4.sh > /tmp/window_r4.log 2>&1 & echo $! > /tmp/window_r4.pid
set -u
cd "$(dirname "$0")/.."
CORPUS=${CORPUS:-results/dmsp20k}
TRAIN_N=${TRAIN_N:-20160}
GEN_PID=${GEN_PID:-$(cat /tmp/gen20k.pid 2>/dev/null || echo 0)}

echo "[window] waiting for corpus + generator exit ($(date -u +%H:%M:%S))"
while [ "$(ls "$CORPUS/train" 2>/dev/null | wc -l)" -lt "$TRAIN_N" ]; do
  sleep 60
done
while [ "$GEN_PID" != "0" ] && kill -0 "$GEN_PID" 2>/dev/null; do
  sleep 15
done
echo "[window] chip free; xprof capture first (short, must land) ($(date -u +%H:%M:%S))"

timeout 900 python tools/profile_kernel.py 256 results/xprof_r4 \
  > results/xprof_r4_summary.txt 2>&1
tail -5 results/xprof_r4_summary.txt
echo "[window] xprof done ($(date -u +%H:%M:%S)); batch sweep"

timeout 1500 python tools/batch_sweep.py --reps 2 --budget 120 \
  | tee results/batch_sweep_r4.jsonl
echo "[window] done ($(date -u +%H:%M:%S))"
