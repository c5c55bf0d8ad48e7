#!/bin/bash
# Hardware-window sequencer: when the TPU relay recovers from a wedge, run
# the short perf-evidence steps FIRST (bounded), then hand the chip to the
# long training chain.  Rationale: the training watchdog otherwise grabs the
# chip for hours the moment the relay answers, and a late recovery would
# squeeze out the perf probe / bench evidence entirely.
#
#   DEADLINE_TS=<unix ts> nohup tools/hw_window.sh >> /tmp/hw_window.log 2>&1 &
#
# Steps (each bounded; a re-wedge mid-step just costs that step's timeout):
#   1. wait for the relay to answer a 90 s probe
#   2. tools/perf_probe.py  -> results/perf_probe_r3.jsonl (bucket A/B)
#   3. bench.py             -> results/BENCH_r3_self.json  (headline matrix)
#   4. training chain via train_watchdog (deadline-aware, resumes from ckpt)
set -u
cd "$(dirname "$0")/.."
DEADLINE_TS=${DEADLINE_TS:-0}

tpu_ready() {
  timeout 90 python -c "import jax, jax.numpy as jnp; \
assert any(d.platform != 'cpu' for d in jax.devices()); \
print(float(jnp.ones((8,128)).sum()))" >/dev/null 2>&1
}

echo "[hw] waiting for relay ($(date -u +%H:%M:%S))"
until tpu_ready; do
  echo "[hw] relay wedged; retry in 60 s"
  sleep 60
done
echo "[hw] relay up at $(date -u +%H:%M:%S); perf probe"

timeout 1500 python tools/perf_probe.py --reps 3 \
  > results/perf_probe_r3.jsonl 2> /tmp/perf_probe_r3.err
echo "[hw] perf probe rc=$? ($(date -u +%H:%M:%S)); bench"

timeout 2100 python bench.py > results/BENCH_r3_self.json 2> /tmp/bench_r3.err
echo "[hw] bench rc=$? ($(date -u +%H:%M:%S)); launching training chain"

FDTD_CACHE_F16=1 FDTD_DEVICE_CACHE_GB=12 \
  exec python tools/train_watchdog.py --load-name dmsp5k \
  --save-dir results/dmsp-train-r3c --epochs 80 --x-stride 1 \
  --deadline-ts "$DEADLINE_TS"
