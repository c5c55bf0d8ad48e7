#!/bin/bash
# Score the FINAL checkpoint of a run as a supplementary protocol.
#
# The headline protocol stays reference-parity (BEST by valid/loss,
# Lightning ModelCheckpoint semantics) — but for this architecture the
# valid losses are floor-dominated (see models/losses.py::f0_loss note),
# so BEST selection is noisy and can freeze on an early epoch.  This
# script copies the last step_* checkpoint into <run>-last (no BEST
# marker, so latest_checkpoint picks it) and scores it with the same
# honest estimated-mode protocol.
#
#   tools/score_last.sh results/dmsp-train-r5
set -eu
cd "$(dirname "$0")/.."
SRC=${1:-results/dmsp-train-r5}
DST=${2:-${SRC}-last}
LOAD_NAME=${LOAD_NAME:-dmsp2k}

last=$(ls -d "$SRC"/string/*/checkpoints/step_* | sort -t_ -k2 -n | tail -1)
echo "[score-last] scoring $last"
mkdir -p "$DST/string/ckpt/checkpoints"
cp -r "$last" "$DST/string/ckpt/checkpoints/"
timeout 7200 python run.py experiment=synth-dmsp proc.train=false \
  proc.test=true task.load_dir=./results "task.load_name=$LOAD_NAME" \
  task.root_dir=./results "task.save_name=$(basename "$DST")" \
  task.x_stride=1 task.plot=false task.test_batch_size=64 \
  model.mode_estimator=physics ${SCORE_EXTRA:-} \
  > "$DST/test_score.log" 2>&1
echo "[score-last] rc=$? -> $DST/score/"
