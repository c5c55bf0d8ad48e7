#!/bin/bash
# Round-4 self-driving DMSP chain on the dmsp20k corpus (VERDICT r3 #2/#7):
# wait for corpus generation (tools/gen_watchdog.py, 20,160 strings at
# stride 32 + per-batch x-offset jitter), prebuild the host prep caches on
# CPU, then train the PHYSICS-estimator flagship and score the BEST
# checkpoint on the honest inference protocol (use_precomputed_mode=false,
# dmsp.yaml default: the test split synthesizes from the model's own mode
# computation — reference synthesize.py:409-410).
#
#   nohup tools/launch_r4.sh >> /tmp/launch_r4.log 2>&1 &
#   RUN=results/dmsp-train-r4 EPOCHS=80 LOAD_NAME=dmsp20k \
#     SCORE_EXTRA=model.mode_estimator=physics \
#     nohup bash tools/post_train_score.sh >> /tmp/post_score_r4.log 2>&1 &
#
# Safe to re-run: corpus fill resumes via seed cursors, cache prebuild
# skips existing files, training resumes from the latest checkpoint.
set -u
cd "$(dirname "$0")/.."
CORPUS=${CORPUS:-results/dmsp20k}
TRAIN_N=${TRAIN_N:-20160}
EPOCHS=${EPOCHS:-80}
XS=${XS:-2}   # 8 stored pickups/string at stride 32 -> 4 train positions
              # (jitter makes them distinct across strings); 80,640 items,
              # ~8 GB f16 device cache

echo "[r4] waiting for corpus: $CORPUS/train >= $TRAIN_N ($(date -u +%H:%M:%S))"
while [ "$(ls "$CORPUS/train" 2>/dev/null | wc -l)" -lt "$TRAIN_N" ]; do
  sleep 120
done
echo "[r4] corpus ready: $(ls "$CORPUS/train" | wc -l) strings ($(date -u +%H:%M:%S))"

NAME=$(basename "$CORPUS")
# train/valid at the training stride; the test x1 cache feeds the final
# scoring pass (NOT train at x1 — that would be a full-corpus rescan)
PYTHONPATH= JAX_PLATFORMS=cpu python tools/prebuild_cache.py \
  --load-name "$NAME" --x-stride "$XS" --splits train,valid,test || true
PYTHONPATH= JAX_PLATFORMS=cpu python tools/prebuild_cache.py \
  --load-name "$NAME" --x-stride 1 --splits test || true
echo "[r4] caches built ($(date -u +%H:%M:%S)); starting training watchdog"

# valid/test_batch_size 64: the experiment default (256) OOMs HBM during
# in-train validation with the f16 device cache resident (round-3 note)
FDTD_CACHE_F16=1 FDTD_DEVICE_CACHE_GB=12 \
  python tools/train_watchdog.py --load-name "$NAME" \
  --save-dir results/dmsp-train-r4 --epochs "$EPOCHS" --x-stride "$XS" \
  --deadline-ts "${DEADLINE_TS:-0}" \
  model.mode_estimator=physics \
  task.valid_batch_size=64 task.test_batch_size=64
