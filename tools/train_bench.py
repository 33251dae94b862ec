"""Training-step throughput measurement (not the driver bench).

Measures the full v3mod2 train step (forward+backward+AdamW+loss stack) on
the available device at the production geometry (B x 1378 x 1024), printing
steps/sec and training-audio-sec/sec.

Usage: python tools/train_bench.py [--batch 8] [--preset v3mod2] [--iters 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="v3mod2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1378)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--remat", default=None, choices=["full", "attn_out", "mlp", "dots", "none"])
    ap.add_argument("--train-attention", default=None,
                    choices=["xla", "flash"],
                    help="ModelConfig.train_attention_impl (flash = fused "
                         "Pallas fwd + custom VJP, ops/attention_train.py)")
    ap.add_argument("--scores-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="XLA-path attention score storage dtype")
    args = ap.parse_args()

    from jatsr_tpu.utils.runtime import select_platform

    select_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT, count_params
    from jatsr_tpu.train import create_train_state, make_train_step
    from jatsr_tpu.train.step import Normalizer

    preset = get_preset(args.preset)
    if args.remat:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, remat_policy=args.remat))
    if args.train_attention:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, train_attention_impl=args.train_attention))
    if args.scores_dtype:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, scores_dtype=args.scores_dtype))
    if args.no_dropout:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(
                preset.model, dropout=0.0, drop_path_rate=0.0))
    tcfg = dataclasses.replace(
        preset.train, batch_size=args.batch,
        adam_moments_dtype="bfloat16",  # fits 766M AdamW on one v5e chip
    )
    from jatsr_tpu.utils.runtime import select_prng_impl

    select_prng_impl(tcfg.prng_impl)
    model = DiT(preset.model)
    C = preset.model.input_channels
    rs = np.random.RandomState(0)
    hr = jnp.asarray(rs.randn(args.batch, args.frames, C), jnp.float32)
    lr = jnp.asarray(rs.randn(args.batch, args.frames, C), jnp.float32)
    state = create_train_state(model, tcfg, 10_000, (hr, lr))
    n_params = count_params(state.params)
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    step = jax.jit(make_train_step(preset.loss, tcfg, norm),
                   donate_argnums=(0,))

    state, m = step(state, hr, lr)  # compile
    _ = float(m["loss"])
    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, m = step(state, hr, lr)
        _ = float(m["loss"])  # completion barrier
        best = min(best, time.perf_counter() - t0)

    from jatsr_tpu.utils.flops import (
        V5E_BF16_PEAK_FLOPS,
        mfu,
        train_step_flops,
    )

    flops = train_step_flops(preset.model, args.batch, args.frames,
                             tcfg.grad_accum_steps)
    audio_sec = args.batch * args.frames * 512 / 44100
    print(json.dumps({
        "metric": "train_step",
        "params_m": round(n_params / 1e6, 1),
        "batch": args.batch,
        "sec_per_step": round(best, 3),
        "steps_per_sec": round(1.0 / best, 3),
        "train_audio_sec_per_sec": round(audio_sec / best, 1),
        "model_tflops_per_step": round(flops / 1e12, 2),
        "effective_tflops_per_sec": round(flops / best / 1e12, 1),
        "mfu_vs_v5e_bf16_peak": round(mfu(flops, best), 4),
        "remat_policy": preset.model.remat_policy,
        "train_attention": preset.model.train_attention_impl,
        "peak_tflops_assumed": V5E_BF16_PEAK_FLOPS / 1e12,
        "loss": float(m["loss"]),
    }))


if __name__ == "__main__":
    main()
