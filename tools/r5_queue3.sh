#!/bin/bash
# Round-5 queue, phase 3 (session restart recovery).
#
# Remaining on-chip deliverables, cheap-first:
#   1. res-stage profiler re-runs (dtype fix + scalar-fetch warmup landed)
#   2. C=768 fused-unit re-validation (the 8x d=1 outlier is suspected to
#      be the block_until_ready warmup artifact the tools now avoid)
#   3. FIXED 766 M overfit gate (floor-adjusted ratio + lr 2e-4; the 0.40
#      plateau was the consistency-loss floor + Adam noise at lr 1e-3)
#   4. attn_gate_v3b retry (one subprocess per leg)
#   5. 288 M probe train + gate matrix (VERDICT r4 #3) incl. the
#      asym-decode conditions (ADVICE r4 medium), then the scale-transfer
#      delta table vs the r4 60 M summary (checkpoints/v1/probe_r4 was
#      lost with the machine restart; reports/gates_r4/summary.json is
#      the 60 M side of the table).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports/r5
LOG=reports/r5_queue_results.log
touch "$LOG"

note() { echo "[queue3 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_step() {
  local name=$1; shift
  git add -A reports/ "$@" 2>/dev/null
  git commit -q -m "r5 queue3: $name" --no-verify 2>/dev/null || true
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

step resstage_profile2 3000 python tools/profile_res_stage.py --iters 8
step resstage_profile2_b16 3000 python tools/profile_res_stage.py --iters 8 \
    --snake-bf16 --stages 1 2 3
step c768_revalidate 2400 python tools/validate_c768.py

step overfit_766m_fix 7200 python tools/overfit_gate_tpu.py --preset v3mod2 \
    --steps 1500 --resume-midway --out reports/overfit_766m_r5.json

step attn_gate_v3b 10800 python tools/train_attn_gate.py --preset v3 \
    --steps 200 --dropout --batch-size 8 --data-dir /tmp/probe/data \
    --out reports/attn_gate_v3_r5.json

# ---- 288 M probe + scale-transfer (VERDICT r4 #3, ADVICE r4 medium) -------
step train_probe_288m 28800 python -m jatsr_tpu.cli.train --preset v2 \
    --data-dir /tmp/probe/data --epochs 80 --cfg-dropout 0.1 \
    --run-name probe288
step gate_288m 43200 python tools/probe_gate_r4.py --preset v2 \
    --run-dir checkpoints/v2/probe288 --data-dir /tmp/probe/data \
    --out reports/gates_r5_288m --songs 6 --seeds 0 1 2 \
    --only parity interval euler25 heun25 fused_decode fused_decode_asym
step gate_288m_commit 60 cp reports/gates_r5_288m/summary.json \
    reports/r5/gate_288m_summary.json
step scale_transfer2 600 python tools/probe_scale_transfer.py \
    reports/gates_r4/summary.json reports/gates_r5_288m/summary.json \
    --out reports/probe_scale_transfer_r5.json

note "queue3 complete"
