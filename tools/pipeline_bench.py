"""End-to-end serving pipeline benchmark: sampler + crossfade + DAC decode.

``bench.py`` times the north-star sampler workload alone; this tool times
the whole user-visible path the reference's infer_test_v3m2.py covers —
chunk planning, batched 50-step CFG sampling, crossfade, and the 1024-ch
DAC decode back to 44.1 kHz audio — and reports where the seconds go.

Random-init weights (766 M DiT + full-geometry DAC): throughput does not
depend on weight values.

Usage: python tools/pipeline_bench.py [--seconds 128] [--steps 50]
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
    ap.add_argument("--seconds", type=float, default=128.0,
                    help="audio length to super-resolve (16 s chunks)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--bf16", dest="int8", action="store_false", default=True)
    args = ap.parse_args()

    import numpy as np

    import jax

    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from jatsr_tpu.configs import SamplerConfig, get_preset
    from jatsr_tpu.infer import InferencePipeline
    from jatsr_tpu.models import DiT
    from jatsr_tpu.models.dac import DAC
    from jatsr_tpu.train.step import Normalizer

    preset = get_preset("v3")
    mcfg = dataclasses.replace(
        preset.model, param_dtype="bfloat16", dropout=0.0,
        drop_path_rate=0.0,
        matmul_precision="int8_static" if args.int8 else "bf16",
        fused_mlp=args.int8, fused_qkv=args.int8,
        attention_impl="flash", scores_dtype="bfloat16",
    )
    model = DiT(mcfg)
    C = mcfg.input_channels
    key = jax.random.PRNGKey(0)
    dummy = jax.random.normal(key, (1, 64, C))
    params = model.init({"params": key, "dropout": key}, dummy,
                        jnp.zeros((1,)), dummy)["params"]
    # full 44.1 kHz geometry (rates 2/4/8/8); bf16 decode leg when int8
    # serving is on (parity: tests/test_dac.py::test_bf16_decode_close_to_fp32)
    codec = DAC.random_init(
        0, compute_dtype=jnp.bfloat16 if args.int8 else None)
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    pipe = InferencePipeline(
        model, params, norm, codec,
        SamplerConfig(num_steps=args.steps, cfg_scale=args.cfg_scale),
    )

    frames = int(args.seconds * 44100 / 512)
    lr = np.random.RandomState(0).randn(frames, C).astype(np.float32)

    def run():
        t0 = time.perf_counter()
        gen = pipe.super_resolve_latent_device(lr, jax.random.PRNGKey(1))
        # fetch one scalar: completion barrier without downloading the
        # 50 MB latent (it feeds decode on-device)
        float(gen[0, 0])
        t1 = time.perf_counter()
        wav = pipe.decode_latent(gen)
        # host fetch above is the completion barrier
        t2 = time.perf_counter()
        assert np.isfinite(wav).all()
        return t1 - t0, t2 - t1

    run()  # compile + warmup
    best_s, best_d = float("inf"), float("inf")
    for _ in range(args.iters):
        s, d = run()
        best_s, best_d = min(best_s, s), min(best_d, d)

    audio_sec = frames * 512 / 44100
    print(json.dumps({
        "metric": "pipeline_audio_sec_per_sec_per_chip",
        "value": round(audio_sec / (best_s + best_d), 2),
        "unit": f"audio-sec/s/chip end-to-end ({args.steps}-step CFG "
                f"{args.cfg_scale} + DAC decode)",
        "sampler_audio_sec_per_sec": round(audio_sec / best_s, 2),
        "decode_audio_sec_per_sec": round(audio_sec / best_d, 2),
        "seconds_benched": audio_sec,
    }))


if __name__ == "__main__":
    main()
