"""Loss-curve parity gate for the flash training-attention kernel.

VERDICT r3 #5 / PERF r4: ``ModelConfig.train_attention_impl="flash"``
(ops/attention_train.py — fused Pallas forward + hand-written VJP) is a
throughput knob on the training hot loop; before it can default on, the
loss curve it produces must match the XLA attention path step-for-step
on real data.  This tool trains the SAME preset twice from the same seed
over the same batch order — once per attention impl — and compares the
per-step loss curves.

The per-kernel parity suite (tests/test_attention_train.py) already pins
forward + gradients exactly against the jnp composition, including THROUGH
in-kernel dropout; what it cannot see is drift accumulated by optimizer
feedback over hundreds of real steps, which is exactly what this measures.

With dropout > 0 the two impls draw attention-dropout masks from different
streams (counter-hash in-kernel vs XLA PRNG), so curves are only
statistically comparable; run with --no-dropout (default) for the strict
deterministic gate.  Ref for the training loop being gated:
train_ddp_v3mod2.py:842-931.

Usage:
    python tools/train_attn_gate.py --preset v1 --data-dir /tmp/probe/data \
        --steps 200 [--batch-size 8] [--out /tmp/attn_gate.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_leg(preset, data_dir: str, impl: str, steps: int):
    import jax.numpy as jnp

    from jatsr_tpu.train.loop import Trainer

    p = dataclasses.replace(
        preset, model=dataclasses.replace(
            preset.model, train_attention_impl=impl))
    tr = Trainer(p, data_dir=data_dir, run_name=f"attn_gate_{impl}",
                 writer=False)
    losses, gnorms = [], []
    epoch = 0
    while len(losses) < steps:
        tr.train_loader.set_epoch(epoch)
        for hr, lr in tr.train_loader:
            hr, lr = tr._put_batch(hr, lr)
            tr.state, metrics = tr.train_step(tr.state, hr, lr)
            losses.append(metrics["loss"])
            gnorms.append(metrics.get("grad_norm", jnp.zeros(())))
            if len(losses) >= steps:
                break
        epoch += 1
    return [float(x) for x in losses], [float(x) for x in gnorms]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="v1")
    ap.add_argument("--data-dir", default="/tmp/probe/data")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--dropout", action="store_true",
                    help="keep the preset's dropout (masks differ by stream;"
                         " curves are only statistically comparable)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/attn_gate.json")
    ap.add_argument("--impl", default="both", choices=["both", "xla",
                                                       "flash"],
                    help="run one leg and dump its curves (used internally:"
                         " 'both' re-execs itself per leg so each 766 M "
                         "train state gets a FRESH process/HBM — two legs "
                         "in one process OOM'd a 16 GB chip, r5 queue)")
    args = ap.parse_args()

    if args.impl == "both":
        import subprocess
        import tempfile

        curves = {}
        for impl in ("xla", "flash"):
            print(f"=== training {args.steps} steps with {impl} attention "
                  f"(subprocess) ===", flush=True)
            with tempfile.NamedTemporaryFile(suffix=".json") as tf:
                cmd = [sys.executable, __file__, "--impl", impl,
                       "--out", tf.name, "--preset", args.preset,
                       "--data-dir", args.data_dir,
                       "--steps", str(args.steps)]
                if args.dropout:
                    cmd.append("--dropout")
                if args.batch_size:
                    cmd += ["--batch-size", str(args.batch_size)]
                if args.platform:
                    cmd += ["--platform", args.platform]
                subprocess.run(cmd, check=True)
                curves[impl] = json.load(open(tf.name))["curves"]
        _compare_and_write(args, curves)
        return

    from jatsr_tpu.utils.runtime import (enable_compilation_cache,
                                         select_platform)

    select_platform(args.platform)
    enable_compilation_cache()

    from jatsr_tpu.configs import get_preset

    preset = get_preset(args.preset)
    mover, tover = {}, {}
    if not args.dropout:
        mover = {"dropout": 0.0, "drop_path_rate": 0.0}
    if args.batch_size:
        tover["batch_size"] = args.batch_size
    preset = dataclasses.replace(
        preset,
        model=dataclasses.replace(preset.model, **mover),
        train=dataclasses.replace(preset.train, **tover),
    )

    # single-leg mode: run and dump raw curves
    curves_one = run_leg(preset, args.data_dir, args.impl, args.steps)
    with open(args.out, "w") as f:
        json.dump({"impl": args.impl, "curves": curves_one}, f)
    print(f"[leg {args.impl}] curves -> {args.out}")


def _compare_and_write(args, curves):
    lx, lf = curves["xla"][0], curves["flash"][0]
    n = len(lx)
    abs_d = [abs(a - b) for a, b in zip(lx, lf)]
    rel_d = [d / max(abs(a), 1e-8) for d, a in zip(abs_d, lx)]
    tail = max(1, n // 10)
    mean_tail_x = sum(lx[-tail:]) / tail
    mean_tail_f = sum(lf[-tail:]) / tail
    report = {
        "preset": args.preset, "steps": n, "dropout": bool(args.dropout),
        "max_abs_diff": max(abs_d), "max_rel_diff": max(rel_d),
        "final_tail_mean": {"xla": mean_tail_x, "flash": mean_tail_f},
        "final_tail_rel_gap": abs(mean_tail_x - mean_tail_f)
                              / max(abs(mean_tail_x), 1e-8),
        "loss_xla": lx, "loss_flash": lf,
        "grad_norm_xla": curves["xla"][1],
        "grad_norm_flash": curves["flash"][1],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"steps={n} max_rel_diff={report['max_rel_diff']:.4%} "
          f"tail means xla={mean_tail_x:.5f} flash={mean_tail_f:.5f} "
          f"(rel gap {report['final_tail_rel_gap']:.4%})")
    print(f"[gate] report: {args.out}")


if __name__ == "__main__":
    main()
