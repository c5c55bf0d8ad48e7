#!/bin/bash
# Round-5 adaptive-noise ablation chain: retrain the dmsp2k flagship with
# model.amp_adaptive_noise=true (noise filter scaled by the per-frame
# modal amplitude envelope) and score under the honest protocol.
#
# Motivation (README "DMSP round 5"): per-item r4 scores show the fixed
# noise floor drowns the quietest p_a quartile (-3.2 dB sdr, -11.8 dB
# si-sdr vs modal) while the other quartiles win — sdr is the one metric
# the flagship still loses to the modal baseline.  This run measures
# whether the amplitude-adaptive branch flips it.
#
#   nohup tools/launch_r5n.sh >> /tmp/launch_r5n.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RUN=${RUN:-results/dmsp-train-r5n}
EPOCHS=${EPOCHS:-80}

RUN="$RUN" EPOCHS="$EPOCHS" LOAD_NAME=dmsp2k \
  SCORE_EXTRA="model.mode_estimator=physics model.amp_adaptive_noise=true" \
  nohup bash tools/post_train_score.sh >> /tmp/post_score_r5n.log 2>&1 &

python tools/train_watchdog.py --load-name dmsp2k \
  --save-dir "$RUN" --epochs "$EPOCHS" --x-stride 1 \
  --deadline-ts "${DEADLINE_TS:-0}" \
  model.mode_estimator=physics model.amp_adaptive_noise=true \
  task.ckpt_every=15 task.valid_batch_size=64 task.test_batch_size=64
