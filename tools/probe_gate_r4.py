"""Round-4 quality gates on the 54-song probe (VERDICT r3 #4).

Runs the full schedule-knob gate matrix against the probe_r4 checkpoint
(60 M `v1`, 54 synthetic train songs / 6 held-out, 80 epochs) and prints
mean±std deltas vs the reference-parity schedule.  Every condition runs
the bench serving stack (int8 + fused MLP + flash attention) over
6 held-out songs x 3 sampler seeds, so the numbers gate exactly what the
bench measures.  Ref for the parity schedule: infer_test_v3m2.py:144-164
(always-guided Euler-50).

Conditions
----------
parity        euler-50, CFG always on            <- baseline
interval      euler-50, cfg_interval (0.1,0.75)  <- bench default (r3)
stacked       euler-25 + interval                <- fast mode (r3, ungated)
euler25       euler-25, always guided            <- step-count effect alone
heun25        heun-25 (50 NFE), always guided    <- solver ranking
fused_decode  parity schedule + fused DAC decode <- decoded-metric gate for
                                                    the res-unit/stage kernels

Usage: python tools/probe_gate_r4.py [--run-dir checkpoints/v1/probe_r4]
           [--data-dir /tmp/probe/data] [--out /tmp/probe/gates]
           [--songs 6] [--seeds 0 1 2] [--only COND ...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONDITIONS = {
    "parity": [],
    "interval": ["--cfg-interval", "0.1", "0.75"],
    "stacked": ["--steps", "25", "--cfg-interval", "0.1", "0.75"],
    "euler25": ["--steps", "25"],
    "heun25": ["--steps", "25", "--solver", "heun"],
    "fused_decode": ["--fused-decode"],
    # ADVICE r4 #1: generated audio through the fused kernels, GT/LR through
    # the unfused XLA decoder — decoder-numerics errors cannot cancel.
    "fused_decode_asym": ["--fused-decode", "--unfused-gt-decode"],
    # r5: x*sigmoid(1.702x) GELU in the fused serving MLP (~40% fewer VPU
    # epilogue ops than tanh, max abs err ~0.02) — sanction only if the
    # decoded-metric delta vs parity is within noise.
    "gelu_sigmoid": ["--gelu", "sigmoid"],
    # r5: bf16 snake transcendentals in the fused decode (VPU half-width
    # double rate), asym vs the unfused-XLA GT decoder so decoder-numerics
    # errors cannot cancel.
    "snake_bf16_asym": ["--fused-decode", "--unfused-gt-decode",
                        "--snake-bf16"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="checkpoints/v1/probe_r4")
    ap.add_argument("--preset", default="v1",
                    help="model preset of --run-dir (v2 = the 288 M "
                         "scale-transfer probe, VERDICT r4 #3)")
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--data-dir", default="/tmp/probe/data")
    ap.add_argument("--out", default="/tmp/probe/gates")
    ap.add_argument("--songs", type=int, default=6)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of condition names to (re)run")
    ap.add_argument("--table-only", action="store_true",
                    help="skip runs; just print the table from saved reports")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    todo = args.only or list(CONDITIONS)

    if not args.table_only:
        for name in todo:
            extra = CONDITIONS[name]
            print(f"=== {name} ===", flush=True)
            cmd = [
                sys.executable, str(REPO / "tools/eval_run.py"),
                "--run-dir", args.run_dir, "--checkpoint", args.checkpoint,
                "--preset", args.preset, "--data-dir", args.data_dir,
                "--num-songs", str(args.songs), "--steps", str(args.steps),
                "--cfg-scale", "3.0", "--int8", "--scores-dtype", "bfloat16",
                "--fused-mlp", "--attention", "flash",
                "--seeds", *map(str, args.seeds),
                "--output-dir", str(out / name),
            ] + extra
            r = subprocess.run(cmd, cwd=REPO)
            if r.returncode:
                print(f"[gate] {name} FAILED rc={r.returncode}")

    # ---- comparison table -------------------------------------------------
    reports = {}
    for name in CONDITIONS:
        p = out / name / "report.json"
        if p.exists():
            reports[name] = json.loads(p.read_text())
    if "parity" not in reports:
        print("[gate] no parity report; nothing to compare")
        return
    base = reports["parity"]["avg_generated"]
    print(f"\n{'condition':14} {'LSD':>14} {'MelL1':>14} "
          f"{'dLSD':>7} {'dMelL1':>8}")
    for name, r in reports.items():
        g, s = r["avg_generated"], r["std_generated"]
        print(f"{name:14} {g['lsd']:7.3f}±{s['lsd']:5.3f} "
              f"{g['mel_l1']:7.3f}±{s['mel_l1']:5.3f} "
              f"{g['lsd'] - base['lsd']:+7.3f} "
              f"{g['mel_l1'] - base['mel_l1']:+8.3f}")
    (out / "summary.json").write_text(json.dumps(
        {n: {"avg": r["avg_generated"], "std": r["std_generated"],
             "seeds": r["seeds"], "num_songs": r["num_songs"],
             "steps": r["steps"], "solver": r["solver"],
             "cfg_interval": r["cfg_interval"],
             "fused_decode": r["fused_decode"]}
         for n, r in reports.items()}, indent=2))
    print(f"[gate] summary: {out}/summary.json")


if __name__ == "__main__":
    main()
