"""Capture a jax.profiler trace of one train step and summarise op time.

Answers "where do the milliseconds go" for the TRAINING path (VERDICT r3
#5: training got three rounds less kernel attention than serving).  Same
trace-accounting views as profile_sampler.py: leaf HLO self-time and the
by-model-op aggregation that attributes fusions to the producing module.

Usage: python tools/profile_train.py [--batch 16] [--preset v3mod2]
           [--scores-dtype float32] [--remat full]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_sampler import summarize_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="v3mod2")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1378)
    ap.add_argument("--scores-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--train-attention", default=None,
                    choices=["xla", "flash"],
                    help="ModelConfig.train_attention_impl")
    ap.add_argument("--remat", default=None, choices=["full", "attn_out", "mlp", "dots", "none"])
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--out", default="/tmp/jatsr_profile_train")
    ap.add_argument("--summarize-only", default=None)
    args = ap.parse_args()

    if args.summarize_only:
        summarize_trace(args.summarize_only, top=40)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.train import create_train_state, make_train_step
    from jatsr_tpu.train.step import Normalizer
    from jatsr_tpu.utils.runtime import select_prng_impl

    preset = get_preset(args.preset)
    mkw = {}
    if args.scores_dtype:
        mkw["scores_dtype"] = args.scores_dtype
    if args.train_attention:
        mkw["train_attention_impl"] = args.train_attention
    if args.remat:
        mkw["remat_policy"] = args.remat
    if args.no_dropout:
        mkw.update(dropout=0.0, drop_path_rate=0.0)
    if mkw:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, **mkw))
    tcfg = dataclasses.replace(preset.train, batch_size=args.batch,
                               adam_moments_dtype="bfloat16")
    select_prng_impl(tcfg.prng_impl)

    model = DiT(preset.model)
    C = preset.model.input_channels
    rs = np.random.RandomState(0)
    hr = jnp.asarray(rs.randn(args.batch, args.frames, C), jnp.float32)
    lr = jnp.asarray(rs.randn(args.batch, args.frames, C), jnp.float32)
    state = create_train_state(model, tcfg, 10_000, (hr, lr))
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    step = jax.jit(make_train_step(preset.loss, tcfg, norm),
                   donate_argnums=(0,))

    state, m = step(state, hr, lr)  # compile outside the trace
    print(json.dumps({"compiled": True, "loss": float(m["loss"])}))
    with jax.profiler.trace(args.out):
        state, m = step(state, hr, lr)
        _ = float(m["loss"])
    print(f"[profile] trace written to {args.out}")
    summarize_trace(args.out, top=40)


if __name__ == "__main__":
    main()
