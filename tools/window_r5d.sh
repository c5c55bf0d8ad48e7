#!/bin/bash
# Round-5 perf agenda, revision d.  Resumes window_r5c after the bench
# ghost fix (pull-timed walls): the r5 flagship is scored, the attrition
# draws are dumped and their CPU reference re-runs are already detached —
# this script redoes the perf measurements with the fixed timer and then
# hands off to the post-agenda chain (r5n ablation -> bounded r5b).
#
#   nohup tools/window_r5d.sh >> /tmp/window_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

save_evidence() { # save_evidence <commit message> <paths...>
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null && git commit -q -m "$msg" || true
}

# 1. full bench run — the builder-side perf record for the round
timeout 3600 python bench.py > /tmp/bench_r5_builder.out 2>> /tmp/window_r5.err || true
grep '^{' /tmp/bench_r5_builder.out | tail -1 > results/bench_r5_builder.json
echo "[window-d] bench done ($(date -u +%H:%M:%S)): $(cut -c1-160 results/bench_r5_builder.json)"
save_evidence "Builder-side bench record for round 5 (pull-timed)" results/bench_r5_builder.json

# 2. batch sweep (VERDICT r4 weak #4)
timeout 2400 python tools/batch_sweep.py --reps 3 --budget 420 \
  > results/batch_sweep_r5.jsonl 2>> /tmp/window_r5.err || true
echo "[window-d] batch sweep done ($(date -u +%H:%M:%S))"
save_evidence "Measured batch-size throughput sweep (round 5)" results/batch_sweep_r5.jsonl

# 3. perf probe
timeout 2400 python tools/perf_probe.py --reps 3 --budget 420 \
  > results/perf_probe_r5.jsonl 2>> /tmp/window_r5.err || true
echo "[window-d] perf probe done ($(date -u +%H:%M:%S))"
save_evidence "Kernel perf probe matrix (round 5)" results/perf_probe_r5.jsonl

# 4. xprof capture behind the roofline claim (VERDICT r4 weak #5)
timeout 1200 python tools/profile_kernel.py 256 results/xprof_r5 \
  >> /tmp/window_r5.err 2>&1 || true
echo "[window-d] xprof capture done ($(date -u +%H:%M:%S))"

echo "[window-d] handing off to the post-agenda chain"
DEADLINE_TS=${DEADLINE_TS:-1787247000} bash tools/launch_r5b.sh
