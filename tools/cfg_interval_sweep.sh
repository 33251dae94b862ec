#!/bin/bash
# Sweep CFG-interval windows on the quality-gate checkpoint to decide how
# wide the guided window must be (VERDICT r2 #2d follow-up: (0.05, 0.9)
# measured BETTER held-out metrics than always-guided; narrower windows
# buy throughput linearly in the guided-step count, so find the knee).
#
# Usage: tools/cfg_interval_sweep.sh [workdir]   (default /tmp/qgate)
# Requires the gate checkpoint from tools/quality_gate.sh.
set -e
cd "$(dirname "$0")/.."
W=${1:-/tmp/qgate}
RUN=checkpoints/v1/qgate

for iv in "0.0 1.0" "0.05 0.9" "0.05 0.85" "0.05 0.8" "0.1 0.8" "0.1 0.75"; do
  tag=$(echo "$iv" | tr ' .' '_p')
  echo "=== cfg-interval $iv ==="
  timeout 2400 python tools/eval_run.py --run-dir "$RUN" --checkpoint last \
    --preset v1 --data-dir "$W/data" --num-songs 2 --steps 50 \
    --cfg-scale 3.0 --int8 --scores-dtype bfloat16 --fused-mlp \
    --attention flash --cfg-interval $iv \
    --output-dir "$W/eval_iv_$tag" 2>&1 | tail -3
done

W=$W python - <<'EOF'
import json, glob, os, re
rows = []
for p in sorted(glob.glob(os.environ["W"] + "/eval_iv_*/report.json")):
    r = json.load(open(p))
    tag = re.search(r"eval_iv_([^/]*)/", p).group(1)
    g = r["avg_generated"]
    rows.append((tag, g["lsd"], g["mel_l1"], g["mel_l2"]))
print(f"{'interval':14} {'LSD':>7} {'MelL1':>7} {'MelL2':>7}")
for tag, lsd, l1, l2 in rows:
    print(f"{tag:14} {lsd:7.3f} {l1:7.3f} {l2:7.3f}")
EOF
