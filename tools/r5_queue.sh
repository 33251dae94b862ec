#!/bin/bash
# Round-5 resumable measurement queue (single TPU chip, cheap-first).
#
# Each step writes its artifact under reports/, drops a done-marker in
# reports/r5/, and auto-commits — so a tunnel drop or VM reset resumes
# exactly where it left off (re-run this script).  Order mirrors the
# PERF.md round-5 queue: traces first (minutes), then training profiles,
# then the 766 M convergence gates, then the probe retrain + gate matrix
# at 60 M and 288 M (the scale-transfer deliverable, VERDICT r4 #3).
set -u
cd "$(dirname "$0")/.."
mkdir -p reports/r5
LOG=reports/r5_queue_results.log
touch "$LOG"

note() { echo "[queue $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_step() {  # commit_step <name> <paths...>
  local name=$1; shift
  git add -A reports/ "$@" 2>/dev/null
  git commit -q -m "r5 queue: $name" --no-verify 2>/dev/null || true
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local marker="reports/r5/$name.done"
  if [ -f "$marker" ]; then note "skip $name (done)"; return 0; fi
  note "start $name: $*"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >"reports/r5/$name.out" 2>&1; then
    note "done $name (${?}=0, $((SECONDS-t0))s)"
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

# ---- Queue item 3: per-op floor tables at HEAD ------------------------------
step trace_sampler 3000 python bench.py --iters 1 --trace /tmp/trace_r5_sampler
step trace_sampler_sum 600 python tools/profile_sampler.py \
    --summarize-only /tmp/trace_r5_sampler
step trace_e2e 3000 python bench.py --end-to-end --iters 1 \
    --trace /tmp/trace_r5_e2e
step trace_e2e_sum 600 python tools/profile_sampler.py \
    --summarize-only /tmp/trace_r5_e2e
step profile_decode 3000 python tools/profile_decode.py --iters 4 \
    --trace /tmp/trace_r5_decode

# ---- Queue item 4: training remat A/B + leaf profile (VERDICT r4 #6) --------
step train_remat_full 3000 python tools/train_bench.py --batch 16 --iters 4
step train_remat_mlp 3000 python tools/train_bench.py --batch 16 --iters 4 \
    --remat mlp
step profile_train 3000 python tools/profile_train.py --batch 16 \
    --out /tmp/trace_r5_train

# ---- Queue item 5: 766 M convergence evidence (VERDICT r4 #2) ---------------
step overfit_766m 7200 python tools/overfit_gate_tpu.py --preset v3mod2 \
    --resume-midway --out reports/overfit_766m_r5.json

# ---- Probe data prep (required by attn gate v3 + the gate matrices) ---------
step prep_probe 7200 python -m jatsr_tpu.cli.prepare_dataset \
    --source-dirs /root/probe/songs --output-dir /tmp/probe/data

# B=8: preset v3's default 28 OOMs the 16 GB chip in this two-leg gate
# (VERDICT r4 #2b asks for B=8-16 anyway).
step attn_gate_v3 7200 python tools/train_attn_gate.py --preset v3 \
    --steps 200 --dropout --batch-size 8 --data-dir /tmp/probe/data \
    --out reports/attn_gate_v3_r5.json

# ---- Probe retrain at 60 M, then the gate matrix incl. the asym decode gate -
step train_probe_60m 14400 python -m jatsr_tpu.cli.train --preset v1 \
    --data-dir /tmp/probe/data --epochs 80 --cfg-dropout 0.1 \
    --run-name probe_r4
step gate_60m 28800 python tools/probe_gate_r4.py \
    --run-dir checkpoints/v1/probe_r4 --data-dir /tmp/probe/data \
    --out reports/gates_r5_60m --songs 6 --seeds 0 1 2
step gate_60m_commit 60 cp -r reports/gates_r5_60m/summary.json \
    reports/r5/gate_60m_summary.json

# ---- 288 M scale-transfer probe (VERDICT r4 #3) ------------------------------
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

note "queue complete"
