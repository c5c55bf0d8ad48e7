#!/bin/bash
# Self-driving dmsp5k x_stride=1 training chain (round-3 DMSP quality run).
#
#   nohup tools/launch_r3c.sh >> /tmp/train_r3c_driver.log 2>&1 &
#   RUN=results/dmsp-train-r3c EPOCHS=80 \
#     nohup bash tools/post_train_score.sh >> /tmp/post_train_score_r3c.log 2>&1 &
#
# Waits for the prebuilt host prep cache (tools/prebuild_cache.py), then
# runs the wedge-tolerant watchdog (which itself waits for the device relay
# to answer).  Safe to re-run: training resumes from the latest checkpoint.
cd "$(dirname "$0")/.."
CACHE=results/dmsp5k/_prep_train_40_256_48000_48000_x1.npz
while [ ! -f "$CACHE" ]; do sleep 60; done
echo "[launch] prebuild cache ready at $(date -u +%H:%M:%S); starting watchdog"
# valid/test_batch_size: the experiment default (256) OOMs HBM during
# in-train validation when the 8 GB f16 x1 device cache is resident — the
# eval executable's MRSTFT temps at B=256 exceed the remaining headroom
# (observed ResourceExhausted at epoch-0 validation, 2026-08-18).  64 keeps
# the eval peak well under the train step's own footprint.
FDTD_CACHE_F16=1 FDTD_DEVICE_CACHE_GB=12 \
  python tools/train_watchdog.py --load-name dmsp5k \
  --save-dir results/dmsp-train-r3c --epochs 80 --x-stride 1 \
  --deadline-ts "${DEADLINE_TS:-0}" \
  task.valid_batch_size=64 task.test_batch_size=64
