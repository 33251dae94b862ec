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
    ("bf16 B=8 (default)", ["--batch", "8"]),
    ("bf16 B=16", ["--batch", "16"]),
    ("int8 B=8", ["--batch", "8", "--int8"]),
    ("pallas-attn B=8", ["--batch", "8", "--attention", "pallas"]),
]

TRAIN_CONFIGS = [
    ("766M B=8", ["--batch", "8"]),
    ("766M B=16", ["--batch", "16"]),
    ("766M B=16 MSE-only", ["--batch", "16", "--preset", "v3"]),
]


def run(cmd, name):
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
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
    for name, flags in INFER_CONFIGS:
        run([sys.executable, str(ROOT / "bench.py"), *flags, *extra], name)
    if not args.skip_train and not args.quick:
        for name, flags in TRAIN_CONFIGS:
            run([sys.executable, str(ROOT / "tools/train_bench.py"), *flags],
                name)


if __name__ == "__main__":
    main()
