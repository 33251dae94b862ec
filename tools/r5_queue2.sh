#!/bin/bash
# Round-5 queue, phase 2: perf A/Bs for the r5 code changes (C=768 fused
# unit, e2e barrier, divisor picker), the longer 766 M overfit gate, then
# the probe retrain + scale-transfer gate matrix (VERDICT r4 #2/#3).
# Same resumable structure as r5_queue.sh (done-markers under reports/r5,
# auto-commit per step).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports/r5
LOG=reports/r5_queue_results.log
touch "$LOG"

note() { echo "[queue2 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_step() {
  local name=$1; shift
  git add -A reports/ "$@" 2>/dev/null
  git commit -q -m "r5 queue2: $name" --no-verify 2>/dev/null || true
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

# ---- A: validate + profile the r5 decode/serving changes on chip -----------
step c768_validate 2400 python tools/validate_c768.py
if [ ! -f reports/r5/c768_validate.done ]; then
  # Kernel failed on chip: revert the eligibility gate so the driver bench
  # cannot crash, and record the revert.
  note "c768 FAILED — reverting res_unit_supported to C<=384"
  python - <<'EOF'
import re, pathlib
p = pathlib.Path("jatsr_tpu/ops/dac_kernels.py")
s = p.read_text()
s = s.replace("return c <= 768 and t >=", "return c <= 384 and t >=")
p.write_text(s)
EOF
  git add jatsr_tpu/ops/dac_kernels.py
  git commit -q -m "Revert C=768 fused res-unit eligibility (failed on-chip validation)" --no-verify || true
fi

step resstage_profile 3000 python tools/profile_res_stage.py --iters 8
step resstage_profile_b16 3000 python tools/profile_res_stage.py --iters 8 \
    --snake-bf16 --stages 1 2 3
step bench_head 3600 python bench.py --iters 2
step bench_gelu_sigmoid 1800 python bench.py --iters 2 --gelu sigmoid --skip-e2e
step bench_b14 1800 python bench.py --iters 2 --batch 14 --skip-e2e
step bench_b16 1800 python bench.py --iters 2 --batch 16 --skip-e2e

# ---- B: 766 M convergence evidence, longer run (first try: 0.068x @600) ----
step overfit_766m_2k 7200 python tools/overfit_gate_tpu.py --preset v3mod2 \
    --steps 2000 --resume-midway --out reports/overfit_766m_r5.json

# retry of queue1's attn_gate_v3 (OOM: two 766 M legs in one process;
# the tool now re-execs one subprocess per leg)
step attn_gate_v3b 10800 python tools/train_attn_gate.py --preset v3 \
    --steps 200 --dropout --batch-size 8 --data-dir /tmp/probe/data \
    --out reports/attn_gate_v3_r5.json

# ---- C: probe retrain + the scale-transfer gate matrices -------------------
step train_probe_60m 14400 python -m jatsr_tpu.cli.train --preset v1 \
    --data-dir /tmp/probe/data --epochs 80 --cfg-dropout 0.1 \
    --run-name probe_r4
step gate_60m 28800 python tools/probe_gate_r4.py \
    --run-dir checkpoints/v1/probe_r4 --data-dir /tmp/probe/data \
    --out reports/gates_r5_60m --songs 6 --seeds 0 1 2
step gate_60m_commit 60 cp reports/gates_r5_60m/summary.json \
    reports/r5/gate_60m_summary.json

step train_probe_288m 28800 python -m jatsr_tpu.cli.train --preset v2 \
    --data-dir /tmp/probe/data --epochs 80 --cfg-dropout 0.1 \
    --run-name probe288
step gate_288m 43200 python tools/probe_gate_r4.py --preset v2 \
    --run-dir checkpoints/v2/probe288 --data-dir /tmp/probe/data \
    --out reports/gates_r5_288m --songs 6 --seeds 0 1 2 \
    --only parity interval euler25 heun25
step scale_transfer 600 python tools/probe_scale_transfer.py \
    reports/gates_r5_60m/summary.json reports/gates_r5_288m/summary.json \
    --out reports/probe_scale_transfer_r5.json

note "queue2 complete"
