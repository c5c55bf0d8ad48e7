#!/bin/bash
# Round-5 hardware-window orchestrator.  The training+scoring chain
# (train_watchdog + post_train_score, armed separately) grabs the TPU the
# moment the relay recovers; this script waits for the dmsp2k flagship
# scoring to COMPLETE, then runs the perf/evidence agenda in order, then
# hands the chip to the dmsp20k scale-up chain:
#
#   1. tools/batch_sweep.py        -> results/batch_sweep_r5.jsonl
#   2. tools/perf_probe.py         -> results/perf_probe_r5.jsonl
#   3. attrition draws (96-sample production recipe, task.dump_draws)
#   4. tools/profile_kernel.py     -> results/xprof_r5/
#   5. tools/launch_r5b.sh         (corpus regen + scale-up training)
#
# The CPU half of the attrition study (reference f64 re-runs) is launched
# detached at step 3 so it overlaps the remaining TPU work.
#
#   nohup tools/window_r5.sh >> /tmp/window_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=${RUN:-results/dmsp-train-r5}

score_done() {
  [ -s "$RUN/score/output.txt" ] && grep -q "^# mean" "$RUN/score/output.txt"
}

echo "[window] waiting for $RUN scoring to complete ($(date -u +%H:%M:%S))"
while ! score_done; do sleep 120; done
echo "[window] scoring complete ($(date -u +%H:%M:%S)); perf agenda"

timeout 2400 python tools/batch_sweep.py --reps 3 --budget 420 \
  > results/batch_sweep_r5.jsonl 2>> /tmp/window_r5.err || true
echo "[window] batch sweep done ($(date -u +%H:%M:%S))"

timeout 2400 python tools/perf_probe.py --reps 3 --budget 420 \
  > results/perf_probe_r5.jsonl 2>> /tmp/window_r5.err || true
echo "[window] perf probe done ($(date -u +%H:%M:%S))"

# attrition draws: the production recipe with full draw dumps (B=24: the
# bench's OOM-safe batch for this fused-prep recipe with save off)
rm -rf results/attrition-r5 results/attrition-r5-prep
timeout 2400 python run.py experiment=nsynth-like task.num_samples=96 \
  task.batch_size=24 task.save=false task.plot=false task.dump_draws=true \
  task.save_name=attrition-r5 >> /tmp/window_r5.err 2>&1 || true
echo "[window] attrition draws done ($(date -u +%H:%M:%S))"
if ls results/attrition-r5/draw-*.npz >/dev/null 2>&1; then
  PYTHONPATH= JAX_PLATFORMS=cpu nohup python tools/attrition_study.py \
    --run results/attrition-r5 --controls 10 --length 1.0 \
    --out results/attrition_study_r5.json \
    >> /tmp/attrition_r5.log 2>&1 &
  echo "[window] attrition reference re-runs detached (CPU)"
fi

timeout 1200 python tools/profile_kernel.py 256 results/xprof_r5 \
  >> /tmp/window_r5.err 2>&1 || true
echo "[window] xprof capture done ($(date -u +%H:%M:%S))"

echo "[window] handing off to the dmsp20k scale-up chain"
DEADLINE_TS=${DEADLINE_TS:-0} bash tools/launch_r5b.sh
