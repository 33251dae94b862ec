"""Device-time profile of the DAC decode leg (VERDICT r2 #7).

The pipeline-bench decode numbers are tunnel-confounded (host<->device
transfer dominates wall clock), so this tool measures the decoder the same
way the sampler is measured: a chained, data-dependent loop of ``iters``
decodes inside one jitted program — one dispatch, one scalar fetch — giving
device time per decode, from which a transfer-excluded audio-sec/s falls
out.  Optionally captures a jax.profiler trace and prints the per-op
summary (reuses profile_sampler.summarize_trace).

Usage:
    python tools/profile_decode.py [--seconds 32] [--ctx 64] [--iters 8]
        [--bf16] [--trace /tmp/jatsr_decode_profile]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_sampler import summarize_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=32.0,
                    help="segment length (matches decode_latent's default)")
    ap.add_argument("--ctx", type=int, default=64,
                    help="context frames each side (decode_latent default)")
    ap.add_argument("--iters", type=int, default=8,
                    help="chained decodes inside the jitted program")
    ap.add_argument("--no-fused", dest="fused", action="store_false",
                    default=True,
                    help="disable the fused Pallas residual-unit kernel "
                         "(ops/dac_kernels.py) and measure the plain "
                         "XLA conv path")
    ap.add_argument("--bf16", action="store_true",
                    help="decoder conv stacks in bf16 (the serving knob)")
    ap.add_argument("--trace", default=None,
                    help="also capture a profiler trace to this dir")
    ap.add_argument("--quick", action="store_true",
                    help="tiny codec + short segment (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.models.dac import DAC, DACConfig
    from jatsr_tpu.models.dac.model import init_params
    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    if args.quick:
        cfg = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                        decoder_rates=(4, 2), n_codebooks=2,
                        codebook_size=16, codebook_dim=4)
        T = 64
        args.iters = min(args.iters, 2)
    else:
        cfg = DACConfig()  # production 44.1 kHz geometry, 1024-ch latent
        T = int(args.seconds * 44100 / 512) + 2 * args.ctx
    codec = DAC(init_params(jax.random.PRNGKey(0), cfg), cfg,
                compute_dtype=jnp.bfloat16 if args.bf16 else None,
                fused_res_units=args.fused)

    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.latent_dim),
                           jnp.float32)

    decode = codec.decode

    @jax.jit
    def chained(z):
        def body(i, carry):
            z, acc = carry
            wav = decode(z)
            # data dependence: feed a scalar of the output back into the
            # next iteration's input so XLA cannot parallelise/elide
            acc = acc + wav.mean()
            z = z + (acc * 1e-20).astype(z.dtype)
            return z, acc

        _, acc = jax.lax.fori_loop(0, args.iters, body,
                                   (z, jnp.float32(0.0)))
        return acc

    # compile + warm
    float(chained(z0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(z0))  # host scalar fetch = completion barrier
        best = min(best, time.perf_counter() - t0)
    per_decode = best / args.iters
    audio_sec = T * cfg.hop_length / 44100
    print(json.dumps({
        "metric": "decode_audio_sec_per_sec_device",
        "segment_audio_sec": round(audio_sec, 2),
        "per_decode_ms": round(per_decode * 1e3, 2),
        "audio_sec_per_sec": round(audio_sec / per_decode, 1),
        "compute_dtype": "bfloat16" if args.bf16 else "float32",
    }))

    if args.trace:
        with jax.profiler.trace(args.trace):
            float(chained(z0))
        print(f"[profile] trace written to {args.trace}")
        summarize_trace(args.trace)


if __name__ == "__main__":
    main()
