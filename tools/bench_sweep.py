"""Reproduce the PERF.md measurement table.

Runs the inference bench across configurations and the train-step bench
across batch sizes, printing one JSON line per configuration.  Each bench
runs in a fresh subprocess (jax global config — PRNG impl, platform —
must not leak between configurations).

Usage: python tools/bench_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

INFER_CONFIGS = [
    # Defaults = the full quality-gated serving stack: int8_static +
    # bf16 scores + fused MLP (tanh, fast epilogue) + fused QKV + flash
    # v3.1 attention + hoisted AdaLN (PERF.md round 2).
    ("serving stack B=8 (default)", ["--batch", "8"]),
    ("bf16 parity path B=8", ["--batch", "8", "--bf16",
                              "--scores-dtype", "float32",
                              "--attention", "xla"]),
    ("stack B=16", ["--batch", "16"]),
    ("stack, XLA attention", ["--batch", "8", "--attention", "xla"]),
    ("stack, erf GELU", ["--batch", "8", "--gelu", "erf"]),
    ("stack, exact epilogue", ["--batch", "8", "--no-fast-epilogue"]),
    ("stack, whole-MLP kernel", ["--batch", "8", "--fused-mlp-impl",
                                 "full"]),
    ("stack, fused out-proj", ["--batch", "8", "--flash-out"]),
    ("stack, 25-step", ["--batch", "8", "--steps", "25"]),
    ("stack, cfg-interval .05-.9",
     ["--batch", "8", "--cfg-interval", "0.05", "0.9"]),
]

TRAIN_CONFIGS = [
    ("766M B=8", ["--batch", "8"]),
    ("766M B=16", ["--batch", "16"]),
    ("766M B=16 MSE-only", ["--batch", "16", "--preset", "v3"]),
]


def run(cmd, name, env=None):
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    full_env = None
    if env:
        import os

        full_env = {**os.environ, **env}
    proc = subprocess.run(cmd, capture_output=True, text=True, env=full_env)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
    if proc.returncode != 0:
        print(f"[bench_sweep] {name} FAILED rc={proc.returncode}",
              file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny-model smoke of the sweep machinery")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    extra = ["--quick"] if args.quick else []
    for cfg in INFER_CONFIGS:
        name, flags = cfg[0], cfg[1]
        env = cfg[2] if len(cfg) > 2 else None
        run([sys.executable, str(ROOT / "bench.py"), *flags, *extra], name,
            env=env)
    if not args.skip_train and not args.quick:
        for name, flags in TRAIN_CONFIGS:
            run([sys.executable, str(ROOT / "tools/train_bench.py"), *flags],
                name)


if __name__ == "__main__":
    main()
