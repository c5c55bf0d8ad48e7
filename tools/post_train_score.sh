#!/bin/bash
# Wait for the $RUN watchdog run to reach its final epoch, then score the
# BEST checkpoint on the full test split (x_stride=1: 84 strings x 32
# pickups = 2688 items) against the analytic-modal baseline
# (reference synthesize.py:385-476 semantics).  Detached-safe: run under
# nohup; re-running skips completed stages.
set -u
cd "$(dirname "$0")/.."
RUN=${RUN:-results/dmsp-train-r3}
EPOCHS=${EPOCHS:-300}
METRICS=$RUN/metrics.jsonl

last_epoch() {
  python - "$METRICS" <<'EOF'
import json, sys
ep = -1
try:
    for ln in open(sys.argv[1]):
        try:
            ep = max(ep, int(json.loads(ln).get("epoch", -1)))
        except (ValueError, KeyError):
            pass
except FileNotFoundError:
    pass
print(ep)
EOF
}

echo "[post] waiting for $RUN to reach epoch $((EPOCHS - 1))"
while [ "$(last_epoch)" -lt $((EPOCHS - 1)) ]; do
  sleep 120
done
echo "[post] training complete (epoch $(last_epoch)); scoring test split"

if [ ! -s "$RUN/score/output.txt" ]; then
  timeout 7200 python run.py experiment=synth-dmsp proc.train=false \
    proc.test=true task.load_dir=./results task.load_name=dmsp5k \
    task.root_dir=./results "task.save_name=$(basename "$RUN")" \
    task.x_stride=1 task.plot=false > "$RUN/test_score.log" 2>&1
  echo "[post] scoring rc=$?"
fi
echo "[post] score summary:"
python - "$RUN" <<'EOF'
import os
import sys

import numpy as np

run = sys.argv[1]
for name in ("output", "modals"):
    path = os.path.join(run, "score", f"{name}.txt")
    if not os.path.exists(path):
        print(f"  {name}: MISSING")
        continue
    rows = [l.split("\t") for l in open(path) if l.strip()]
    hdr, data = rows[0], np.array(
        [[float(v) for v in r[1:]] for r in rows[1:]]
    )
    means = " ".join(
        f"{h}={m:.3f}" for h, m in zip(hdr[1:], data.mean(0))
    )
    print(f"  {name} (n={len(data)}): {means}")
EOF
