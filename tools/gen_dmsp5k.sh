#!/bin/bash
# Generate the round-3 DMSP training corpus (VERDICT #4): ~5k nsynth-like
# strings through the fused simulate->dataset path (task.fuse_preprocess),
# split train/valid/test by seed.  Disk-level x stride 8 keeps the corpus
# ~50 GB; the trainer subsamples further with task.x_stride.
#
# Wedge resilience: the axon relay can hang a connection indefinitely, so
# the train split runs as many small timeout-bounded jobs (240 samples
# each) with done-markers — a wedge costs one chunk, and re-running this
# script resumes where it left off.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-results/dmsp5k}
MARK=$OUT/.done
mkdir -p "$MARK"
COMMON="experiment=nsynth-like task.save=false task.plot=false \
  task.save_x_stride=8 task.skip_silence=true task.rescue_nan=false"

gen () { # tag split n seed timeout_s
  local tag=$1 split=$2 n=$3 seed=$4 to=$5
  if [ -e "$MARK/$tag" ]; then echo "[gen] $tag done, skip"; return 0; fi
  timeout "$to" python run.py $COMMON task.num_samples=$n proc.seed=$seed \
    task.save_name=dmsp5k-sim-$tag task.fuse_save_dir=$OUT/$split \
    > "$OUT/log-$tag.txt" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$MARK/$tag"; fi
  echo "[gen] $tag rc=$rc total_$split=$(ls $OUT/$split 2>/dev/null | wc -l)"
  return $rc
}

gen test  test  72 303 2400 || true
gen valid valid 72 202 2400 || true
NCHUNK=${NCHUNK:-21}   # 21 x 240 = 5040 train strings
for i in $(seq 0 $((NCHUNK - 1))); do
  gen "train$i" train 240 $((1000 + i)) 3000 || true
done
echo "[gen] summary: train=$(ls $OUT/train 2>/dev/null | wc -l) \
valid=$(ls $OUT/valid 2>/dev/null | wc -l) test=$(ls $OUT/test 2>/dev/null | wc -l)"
