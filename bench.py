"""Benchmark: audio-seconds generated per second per chip.

North-star metric (BASELINE.json): throughput of the full 766 M-param DiT
flow-matching sampler at 50 steps with CFG — i.e. 100 model invocations per
16 s audio chunk — on one chip.  All chunks are batched through one jitted
ODE program (the reference loops chunks serially, infer_test_v3m2.py:370).

``vs_baseline`` is measured against an estimated A100 real-time factor for
the reference implementation: 766 M fp16 DiT, batch-1 CFG sampling, naive
attention — ~529 GFLOP/forward x 100 per chunk at ~25% batch-1 MFU of
312 TFLOPS => ~0.68 s per 16 s chunk => RTF ~23.  The driver's target is
>=5x this baseline (vs_baseline >= 5.0).

Usage: python bench.py [--quick] [--batch N] [--steps N] [--seconds-per-chunk S]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

A100_BASELINE_RTF = 23.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + few steps (smoke test, CPU-safe)")
    ap.add_argument("--batch", type=int, default=12,
                    help="chunks sampled per sampler call.  Default 12 — "
                         "the round-4 parity B-sweep optimum (B=4/6/8/12/"
                         "16 -> 87.2/92.8/91.2/93.3/92.1 audio-sec/s; "
                         "PERF.md round 4); batch is quality-neutral")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=3.0)
    ap.add_argument("--seconds-per-chunk", type=float, default=16.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", default=None,
                    choices=["bf16", "int8", "int8_static"],
                    help="projection matmul precision (default int8_static: "
                         "bit-identical to the quality-gated dynamic int8 "
                         "path — tests/test_int8_matmul.py proves "
                         "equivalence — with weight quantisation done once "
                         "at load)")
    ap.add_argument("--int8", action="store_true", default=True,
                    help="dynamic W8A8 serving mode on the big projections "
                         "(quality-gated at LSD/Mel deltas <= 0.02 dB vs "
                         "bf16, see PERF.md round 2)")
    ap.add_argument("--bf16", dest="int8", action="store_false",
                    help="disable int8; run the bf16 parity path")
    ap.add_argument("--quantize-head", action="store_true",
                    help="extend int8 to final_proj (quality-gated knob)")
    ap.add_argument("--fused-mlp", action="store_true", default=True,
                    help="Pallas fused dot+GELU+requant MLP first half "
                         "(requires int8_static; default on — quality-gated "
                         "at LSD delta 0.00 dB / Mel L1 delta <= 0.01, "
                         "PERF.md round 2)")
    ap.add_argument("--no-fused-mlp", dest="fused_mlp", action="store_false",
                    help="disable the fused serving MLP kernel")
    ap.add_argument("--fused-qkv", action="store_true", default=True,
                    help="merge q/k/v into one int8 dot (bit-identical to "
                         "separate projections; requires int8_static)")
    ap.add_argument("--no-fused-qkv", dest="fused_qkv", action="store_false")
    ap.add_argument("--attention", default="flash",
                    choices=["xla", "pallas", "pallas2", "flash"],
                    help="default flash: per-batch-program Pallas kernel in "
                         "the projections' natural layout — beats the XLA "
                         "einsum at N=345 (82.8 vs 81.7 audio-sec/s) and is "
                         "quality-gated (PERF.md round 2)")
    ap.add_argument("--scores-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="attention score-matrix storage dtype (default "
                         "bfloat16: halves the dominant attention HBM cost; "
                         "quality-gated at LSD delta 0.00 dB / Mel L1 delta "
                         "<= 0.01 vs fp32 scores, PERF.md round 2; "
                         "--scores-dtype float32 restores the parity path)")
    ap.add_argument("--cfg-interval", type=float, nargs=2,
                    default=(0.0, 1.0), metavar=("LO", "HI"),
                    help="apply CFG only for t in [LO, HI) of the schedule; "
                         "unguided steps run at batch B.  Default (0.0, "
                         "1.0) = the reference's always-guided schedule: "
                         "the round-4 probe gate (54-song training set, 6 "
                         "held-out songs x 3 sampler seeds, "
                         "tools/probe_gate_r4.py) measured the round-3 "
                         "(0.1, 0.75) window at +0.28 dB LSD / +0.08 Mel "
                         "L1 vs always-guided — the round-3 sweep's "
                         "opposite verdict came from a 12-song probe and "
                         "did not replicate, so the bench headline no "
                         "longer rides a schedule change (PERF.md round "
                         "4).  Pass an explicit window for the fast mode.")
    ap.add_argument("--no-cfg-interval", dest="cfg_interval",
                    action="store_const", const=(0.0, 1.0),
                    help="reference-parity guidance: CFG on every step "
                         "(already the default since round 4)")
    ap.add_argument("--cfg-batching", default="doubled",
                    choices=["doubled", "split"],
                    help="guided-step shape: one batch-2B forward "
                         "(doubled, the reference's) or two batch-B "
                         "forwards (split — same math, and the serving "
                         "program is more efficient per chunk at batch 8 "
                         "than 16 on a v5e; see PERF.md round 4)")
    ap.add_argument("--gelu", default="tanh", choices=["tanh", "erf", "sigmoid"],
                    help="in-kernel GELU form for the fused MLP (tanh "
                         "default, quality-gated; erf = exact form)")
    ap.add_argument("--no-fast-epilogue", dest="fast_epilogue",
                    action="store_false", default=True,
                    help="bit-match-the-unfused-path epilogue (bf16 "
                         "round-trips) inside the fused MLP kernel")
    ap.add_argument("--fused-mlp-impl", default="half",
                    choices=["half", "full"],
                    help="fused-MLP variant (half = measured best)")
    ap.add_argument("--flash-out", action="store_true",
                    help="flash v3.2: fuse out_proj into the attention "
                         "kernel (measured slower at v3 geometry)")
    ap.add_argument("--no-flash-qkv", dest="flash_qkv",
                    action="store_false", default=True,
                    help="split-path flash v3 kernel instead of v3.1")
    ap.add_argument("--align-n", action="store_true",
                    help="pad N to a sublane multiple on the flash path")
    ap.add_argument("--flash-pipeline-v", action="store_true",
                    help="flash v3.5: defer each head's value dot one "
                         "iteration so the softmax epilogue hides under "
                         "the MXU stream (identical math; A/B knob)")
    ap.add_argument("--flash-int8-qk", action="store_true",
                    help="flash v3.3: int8 score/value dots inside the "
                         "attention kernel (opt-in, quality-gated "
                         "separately — see tools/fidelity_gate.py)")
    ap.add_argument("--fused-prologue", action="store_true", default=True,
                    help="fold norm+AdaLN-modulate+row-quant into the qkv/"
                         "mlp_in dot kernels (implies --align-n: the "
                         "prologue grid needs an 8-aligned patch count). "
                         "Default on: +14%% under the cfg-interval default "
                         "and covered by tools/fidelity_gate.py")
    ap.add_argument("--no-fused-prologue", dest="fused_prologue",
                    action="store_false",
                    help="separate norm/modulate/quant passes (parity path)")
    ap.add_argument("--unroll-blocks", action="store_true",
                    help="unroll the scanned block stack: the scan's "
                         "per-layer weight dynamic-slices become static "
                         "views (~0.55 ms/step of copies at v3 serving "
                         "geometry); costs compile time")
    ap.add_argument("--int8-impl", default="xla",
                    choices=["xla", "pallas", "fused"],
                    help="dynamic-int8 matmul backend")
    ap.add_argument("--end-to-end", action="store_true",
                    help="measure the composed latent->waveform serving "
                         "workload (sampler + crossfade + segmented DAC "
                         "decode, scalar-fetch completion barrier so the "
                         "tunnel transfer is excluded) instead of the "
                         "sampler-only headline (VERDICT r3 #1)")
    ap.add_argument("--fused-decode", action="store_true", default=True,
                    help="end-to-end mode: decode through the fused Pallas "
                         "residual-unit kernels (+21%% decode)")
    ap.add_argument("--no-fused-decode", dest="fused_decode",
                    action="store_false")
    ap.add_argument("--e2e-seconds", type=float, default=128.0,
                    help="end-to-end mode: total audio length")
    ap.add_argument("--decode-batch", type=int, default=1,
                    help="end-to-end mode: decode segments per decoder "
                         "call ([S, L, C] batched decode; amortises "
                         "per-call overheads — VERDICT r4 #4)")
    ap.add_argument("--snake-bf16", action="store_true",
                    help="end-to-end mode: DAC decode snake transcendentals "
                         "in bf16 (VPU half-width double rate; "
                         "quality-gate before defaulting)")
    ap.add_argument("--skip-e2e", action="store_true",
                    help="print only the sampler headline (cheap A/B "
                         "sweeps; the default output includes both lines)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of ONE post-warmup "
                         "iteration of the EXACT bench program into DIR "
                         "(summarise with tools/profile_sampler.py "
                         "--summarize-only DIR); timing proceeds normally "
                         "afterwards")
    ap.add_argument("--deadline", type=int, default=2700,
                    help="hard wall-clock limit in seconds (the TPU tunnel "
                         "can wedge; better to die loudly than hang)")
    args = ap.parse_args()

    if args.deadline:
        import signal

        def _timeout(signum, frame):
            raise SystemExit(
                f"bench deadline ({args.deadline}s) exceeded — TPU tunnel "
                "likely wedged; retry"
            )

        signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(args.deadline)

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.snake_bf16:
        from jatsr_tpu.ops import dac_kernels as _dk

        _dk.set_snake_compute_dtype("bfloat16")

    from jatsr_tpu.configs import SamplerConfig, get_preset
    from jatsr_tpu.models import DiT, count_params
    from jatsr_tpu.sampling import FlowSampler

    precision = args.precision or ("int8_static" if args.int8 else "bf16")
    preset = get_preset("tiny" if args.quick else "v3")
    from jatsr_tpu.configs import apply_env_aliases

    mcfg = dataclasses.replace(
        preset.model, param_dtype="bfloat16", dropout=0.0, drop_path_rate=0.0,
        matmul_precision=precision,
        quantize_head=args.quantize_head,
        fused_mlp=args.fused_mlp,
        fused_qkv=args.fused_qkv and precision == "int8_static",
        attention_impl=args.attention,
        scores_dtype=args.scores_dtype,
        gelu_impl=args.gelu,
        fast_epilogue=args.fast_epilogue,
        fused_mlp_impl=args.fused_mlp_impl,
        flash_qkv=args.flash_qkv,
        flash_fused_out=args.flash_out,
        flash_int8_qk=args.flash_int8_qk,
        flash_pipeline_v=args.flash_pipeline_v,
        align_n=args.align_n or args.fused_prologue,
        fused_prologue=args.fused_prologue,
        int8_impl=args.int8_impl,
        unroll_blocks=args.unroll_blocks,
    )
    mcfg = apply_env_aliases(mcfg)  # deprecated JATSR_* env knobs
    model = DiT(mcfg)

    T = int(args.seconds_per_chunk * 44100 / 512)  # 1378
    B, C = args.batch, mcfg.input_channels
    if args.quick:
        B, T = 2, 128
        args.steps = min(args.steps, 8)

    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (B, T, C), jnp.float32)
    params = model.init(
        {"params": key, "dropout": key},
        cond, jnp.zeros((B,), jnp.float32), cond,
    )["params"]
    n_params = count_params(params)

    from jatsr_tpu.models.dit import adaln_tables

    sampler = FlowSampler(
        lambda p, z, t, c, mod=None: model.apply({"params": p}, z, t, c,
                                                 adaln_mod=mod),
        SamplerConfig(num_steps=args.steps, cfg_scale=args.cfg_scale,
                      cfg_interval=tuple(args.cfg_interval),
                      cfg_batching=args.cfg_batching),
        params=params,
        # hoisted-AdaLN serving path: per-step modulation tables computed
        # once outside the ODE loop (models/dit.py:adaln_tables)
        adaln_fn=lambda p, tv: adaln_tables(mcfg, p, tv),
    )

    def measure_e2e(do_trace: bool):
        # Composed latent->waveform serving workload (VERDICT r3 #1): one
        # pipeline call covering sample -> denorm -> crossfade -> segmented
        # DAC decode, interleaved enqueues (super_resolve_latent_to_audio
        # shape), with per-piece scalar means as the completion barrier so
        # the measurement is device time, not tunnel bandwidth.
        from jatsr_tpu.infer import InferencePipeline
        from jatsr_tpu.models.dac import DAC
        from jatsr_tpu.train.step import Normalizer
        import numpy as np

        if args.quick:
            from jatsr_tpu.models.dac import DACConfig

            dcfg = DACConfig(encoder_dim=256, encoder_rates=(2, 4),
                             decoder_dim=16, decoder_rates=(4, 2),
                             n_codebooks=2, codebook_size=16,
                             codebook_dim=4)
            assert dcfg.latent_dim == C
            codec = DAC.random_init(0, cfg=dcfg,
                                    fused_res_units=args.fused_decode)
            hop, total_frames = dcfg.hop_length, 300
            seg_frames, ctx = 100, 12
        else:
            codec = DAC.random_init(0, fused_res_units=args.fused_decode)
            hop = 512
            total_frames = int(args.e2e_seconds * 44100 / 512)
            seg_frames, ctx = 2756, 64
        norm = Normalizer(jnp.zeros(C), jnp.ones(C), jnp.zeros(C),
                          jnp.ones(C))
        pipe = InferencePipeline(
            model, params, norm, codec=codec,
            sampler_cfg=dataclasses.replace(
                SamplerConfig(num_steps=args.steps,
                              cfg_scale=args.cfg_scale,
                              cfg_interval=tuple(args.cfg_interval),
                              cfg_batching=args.cfg_batching),
                **({"chunk_duration": T * 512 / 44100,
                    "overlap_duration": 16 * 512 / 44100}
                   if args.quick else {}),
            ),
            hop_length=hop,
        )
        lr = jax.device_put(jax.random.normal(
            key, (total_frames, C), jnp.float32))
        audio_sec = total_frames * hop / 44100 if args.quick \
            else total_frames * 512 / 44100

        def run_e2e(i):
            gen = pipe.super_resolve_latent_device(
                lr, jax.random.PRNGKey(i), args.steps, args.cfg_scale,
                max_batch=args.batch)
            pieces = pipe.decode_latent_pieces(gen, seg_frames, ctx,
                                               decode_batch=args.decode_batch)
            # ONE scalar fetch as the completion barrier (the only
            # reliable barrier under the tunnelled backend): reduce every
            # piece's mean on device first — per-piece float() fetches
            # cost a serialized ~26 ms tunnel round trip EACH (measured
            # r5: 4 pieces ≈ 80 ms of pure host gap per call).
            return float(sum(p.mean() for p in pieces))

        run_e2e(0)  # compile + warmup
        if do_trace and args.trace:
            with jax.profiler.trace(args.trace):
                run_e2e(998)
            print(f"[bench] trace written to {args.trace}")
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            chk = run_e2e(i + 1)
            best = min(best, time.perf_counter() - t0)
        assert chk == chk, "NaN output"
        value = audio_sec / best
        return {
            "metric": "audio_sec_latent_to_wav_per_sec_per_chip",
            "value": round(value, 2),
            "unit": f"audio-sec/s/chip end-to-end ({n_params/1e6:.0f}M DiT "
                    f"{args.steps}-step CFG {args.cfg_scale} {precision} + "
                    f"DAC decode{' fused' if args.fused_decode else ''})",
            "vs_baseline": round(value / A100_BASELINE_RTF, 3),
        }

    if args.end_to_end:
        print(json.dumps(measure_e2e(do_trace=True)))
        return

    def run(i):
        out = sampler(jax.random.PRNGKey(i), cond,
                      num_steps=args.steps, cfg_scale=args.cfg_scale)
        # Fetch a scalar: under the tunnelled backend block_until_ready can
        # return before remote execution completes — a host transfer is the
        # only reliable completion barrier.
        return float(out.mean())

    run(0)  # compile + warmup
    if args.trace:
        with jax.profiler.trace(args.trace):
            run(998)
        print(f"[bench] trace written to {args.trace}")
    best = float("inf")
    for i in range(args.iters):
        t0 = time.perf_counter()
        chk = run(i + 1)
        best = min(best, time.perf_counter() - t0)
    assert chk == chk, "NaN output"

    audio_sec = B * args.seconds_per_chunk if not args.quick else B * T * 512 / 44100
    value = audio_sec / best
    headline = {
        "metric": "audio_sec_generated_per_sec_per_chip",
        "value": round(value, 2),
        "unit": f"audio-sec/s/chip ({n_params/1e6:.0f}M DiT, "
                f"{args.steps}-step CFG {args.cfg_scale}, {precision})",
        "vs_baseline": round(value / A100_BASELINE_RTF, 3),
    }
    if not args.quick and not args.skip_e2e:
        # Also record the user-visible composed workload (VERDICT r4 #8) so
        # every BENCH file carries both numbers.  The sampler headline stays
        # the LAST line — the driver parses the final JSON line as the
        # north-star metric.
        print(json.dumps(measure_e2e(do_trace=False)))
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
