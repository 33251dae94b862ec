"""CLI: chunked long-audio inference (the reference's infer_test_v3m2.py).

Usage:
    python -m jatsr_tpu.cli.infer --run-dir checkpoints/v3mod2/<ts> \
        --preset v3mod2 --stats data_processed/global_stats_separated.json \
        --input song.wav|song.hr.npy --output-dir out \
        [--steps 50] [--cfg-scale 3.0] [--dac-weights weights.pth]

Accepts either a WAV (encoded to an LR latent through the codec) or a saved
``.npy`` latent.  Emits ``<name>_generated[_cfgX].wav`` plus, when ground
truth is available, ``_hr_gt.wav`` and ``_lr_input.wav`` — matching the
reference's outputs (infer_test_v3m2.py:424-442).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-dir", default=None,
                    help="jatsr_tpu run dir with Orbax checkpoints")
    ap.add_argument("--checkpoint", default="best",
                    help="checkpoint name inside run dir (best/last/...)")
    ap.add_argument("--torch-checkpoint", default=None,
                    help="a reference train_ddp_*.py .pt checkpoint to "
                         "convert and run directly")
    ap.add_argument("--preset", default=None,
                    help="preset name; defaults to the run dir's preset.json "
                         "when present, else v3mod2")
    ap.add_argument("--stats", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output-dir", default="inference_output")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=1.0)
    ap.add_argument("--dac-weights", default=None)
    ap.add_argument("--total-seconds", type=float, default=None)
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 serving matmuls (v5e MXU int8 rate)")
    ap.add_argument("--quantize-head", action="store_true",
                    help="extend int8 to the output head")
    ap.add_argument("--scores-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="attention score-matrix storage dtype.  The "
                         "user-facing CLI defaults to the exact float32 "
                         "path; bfloat16 is the quality-gated serving "
                         "mode (PERF.md round 2) that bench/eval tooling "
                         "opts into explicitly")
    ap.add_argument("--fused-mlp", action="store_true",
                    help="Pallas fused dot+GELU+requant serving MLP "
                         "(requires --int8)")
    ap.add_argument("--fused-mlp-impl", default="half",
                    choices=["half", "full"])
    ap.add_argument("--fused-prologue", action="store_true",
                    help="fold norm+AdaLN+quant into the qkv/mlp_in dot "
                         "kernels (requires --int8 --fused-mlp "
                         "--attention flash; enables align_n)")
    ap.add_argument("--gelu", default="tanh", choices=["tanh", "erf", "sigmoid"],
                    help="in-kernel GELU form for --fused-mlp")
    ap.add_argument("--no-fast-epilogue", dest="fast_epilogue",
                    action="store_false", default=True)
    ap.add_argument("--attention", default="xla",
                    choices=["xla", "pallas", "pallas2", "flash"])
    ap.add_argument("--mesh", type=int, nargs=2, default=None,
                    metavar=("DATA", "MODEL"),
                    help="shard serving over a (data, model) device mesh: "
                         "chunk batches data-parallel, params per the TP "
                         "rules (mirrors cli/train.py --mesh)")
    ap.add_argument("--unroll-blocks", action="store_true",
                    help="unroll the scanned block stack (serving: "
                         "per-layer weight slices become static views; "
                         "costs compile time)")
    ap.add_argument("--fused-decode", action="store_true", default=True,
                    help="fuse the decoder tail's residual units into "
                         "single Pallas passes (ops/dac_kernels.py): "
                         "266.6 -> 220.1 ms per 32 s segment on a v5e.  "
                         "DEFAULT since round 4: the decoded-metric gate "
                         "measured +0.000 dB LSD / +0.000 Mel L1 fused vs "
                         "unfused on 6 held-out songs x 3 seeds "
                         "(tools/probe_gate_r4.py, PERF.md round 4); the "
                         "in-kernel bf16 tap dots also carry a "
                         "bf16-resolution numeric parity test "
                         "(tests/test_dac_kernels.py).  fp32-only: "
                         "combined with --bf16-decode the decoder falls "
                         "back to the unfused conv path (warned)")
    ap.add_argument("--no-fused-decode", dest="fused_decode",
                    action="store_false",
                    help="decode through the plain XLA conv path "
                         "(bit-parity reference path)")
    ap.add_argument("--bf16-decode", action="store_true",
                    help="run the DAC decoder conv stack in bf16.  NOTE: "
                         "measured 34%% SLOWER than fp32 on device time "
                         "(per-snake dtype converts dominate, PERF.md "
                         "round 3) — only worth it when transfers, not "
                         "compute, bound the decode leg")
    ap.add_argument("--solver", default="euler",
                    choices=["euler", "heun"],
                    help="ODE solver (heun = 2nd order, 2 model calls "
                         "per step)")
    ap.add_argument("--cfg-interval", type=float, nargs=2,
                    default=(0.0, 1.0), metavar=("LO", "HI"),
                    help="apply CFG only for t in [LO, HI) of the schedule")
    ap.add_argument("--platform", default=None,
                help="force jax platform (cpu/tpu)")
    args = ap.parse_args(argv)

    from ..utils.runtime import select_platform

    select_platform(args.platform)

    import jax
    import numpy as np

    from ..configs import get_preset
    from ..data import load_stats
    from ..infer import InferencePipeline
    from ..models import DiT
    from ..models.dac import DAC
    from ..train import create_train_state
    from ..train.checkpoint import CheckpointManager
    from ..train.step import Normalizer
    from ..utils import load_wav, save_wav

    if args.preset:
        preset = get_preset(args.preset)
    else:
        pj = Path(args.run_dir or ".") / "preset.json"
        if pj.exists():
            from ..configs import Preset

            preset = Preset.from_json(pj.read_text())
            print(f"[infer] preset '{preset.name}' from {pj}")
        else:
            preset = get_preset("v3mod2")
    import dataclasses

    # Checkpoints are stored/converted against the unquantized param layout;
    # int8 serving swaps the model AFTER restore and pre-quantizes the
    # weights once (ops/quant.py:quantize_params_static).
    model = DiT(preset.model)
    C = preset.model.input_channels

    import jax.numpy as jnp

    if args.torch_checkpoint:
        from ..models.convert_dit import load_reference_checkpoint

        params = jax.tree_util.tree_map(
            jnp.asarray,
            load_reference_checkpoint(args.torch_checkpoint, preset.model),
        )
        print(f"[infer] converted reference checkpoint "
              f"{args.torch_checkpoint}")
    else:
        if not args.run_dir:
            raise SystemExit("need --run-dir or --torch-checkpoint")
        # Rebuild a state skeleton and restore weights.
        dummy = jnp.zeros((1, 8, C), jnp.float32)
        state = create_train_state(model, preset.train, 1, (dummy, dummy))
        state, meta = CheckpointManager(args.run_dir).restore(
            args.checkpoint, state
        )
        params = state.params
        print(f"[infer] restored {args.checkpoint} @ step "
              f"{meta['global_step']}")

    if args.fused_mlp and not args.int8:
        raise SystemExit("--fused-mlp requires --int8")
    from ..configs import apply_env_aliases

    serving = dataclasses.replace(
        preset.model, scores_dtype=args.scores_dtype,
        attention_impl=args.attention,
        gelu_impl=args.gelu, fast_epilogue=args.fast_epilogue,
        fused_mlp_impl=args.fused_mlp_impl,
        fused_prologue=args.fused_prologue,
        align_n=args.fused_prologue,
        unroll_blocks=args.unroll_blocks,
    )
    serving = apply_env_aliases(serving)  # deprecated JATSR_* knobs
    print(f"[infer] attention scores dtype: {serving.scores_dtype}")
    if args.int8:
        from ..ops.quant import quantize_params_static

        mcfg = dataclasses.replace(
            serving, matmul_precision="int8_static",
            quantize_head=args.quantize_head,
            fused_mlp=args.fused_mlp,
            # bit-identical to separate q/k/v dots (per-output-column
            # scales) — no separate quality gate needed
            fused_qkv=True,
            dropout=0.0, drop_path_rate=0.0,
        )
        model = DiT(mcfg)
        dummy = jnp.zeros((1, 8, C), jnp.float32)
        shapes = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                dummy, jnp.zeros((1,), jnp.float32), dummy)["params"])
        params = quantize_params_static(params, shapes)
        print("[infer] int8 serving: weights pre-quantized (static W8A8)")
    else:
        model = DiT(dataclasses.replace(serving, dropout=0.0,
                                        drop_path_rate=0.0))

    import jax.numpy as _jnp

    dac_dtype = _jnp.bfloat16 if args.bf16_decode else None
    if args.dac_weights:
        from ..models.dac.convert import load_torch_checkpoint

        codec = DAC(load_torch_checkpoint(args.dac_weights),
                    compute_dtype=dac_dtype,
                    fused_res_units=args.fused_decode)
    else:
        print("[warn] no --dac-weights: RANDOM codec (testing only)")
        codec = DAC.random_init(0, compute_dtype=dac_dtype,
                                fused_res_units=args.fused_decode)

    norm = Normalizer(*load_stats(args.stats))
    scfg = dataclasses.replace(
        preset.sampler, num_steps=args.steps, cfg_scale=args.cfg_scale,
        cfg_interval=tuple(args.cfg_interval), solver=args.solver,
    )
    # Schedule provenance (VERDICT r3 #9): saved artifacts must never be
    # ambiguous about the guidance schedule that produced them.
    print(f"[infer] sampler: {scfg.solver}-{scfg.num_steps}, "
          f"cfg_scale={scfg.cfg_scale}, "
          f"cfg_interval=({scfg.cfg_interval[0]}, {scfg.cfg_interval[1]})"
          + ("" if scfg.cfg_interval == (0.0, 1.0)
             else " [non-parity guidance schedule]"))
    mesh = None
    if args.mesh:
        from ..parallel import make_mesh

        mesh = make_mesh(*args.mesh)
        print(f"[infer] serving mesh: data={args.mesh[0]} x "
              f"model={args.mesh[1]}")
    pipe = InferencePipeline(model, params, norm, codec, scfg, mesh=mesh)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    inp = Path(args.input)
    cfg_suffix = f"_cfg{args.cfg_scale:.1f}" if args.cfg_scale != 1.0 else ""

    if inp.suffix == ".npy":
        lr_latent = np.load(inp).astype(np.float32)
        if args.total_seconds:
            frames = int(args.total_seconds * 44100 / 512)
            lr_latent = lr_latent[:frames]
        gen = pipe.super_resolve_latent(
            lr_latent, jax.random.PRNGKey(0), args.steps, args.cfg_scale
        )
        save_wav(out / f"{inp.stem}_generated{cfg_suffix}.wav",
                 pipe.decode_latent(gen), 44100)
        save_wav(out / f"{inp.stem}_lr_input.wav",
                 pipe.decode_latent(lr_latent), 44100)
        hr_path = Path(str(inp).replace(".lr.npy", ".hr.npy"))
        if hr_path != inp and hr_path.exists():
            hr = np.load(hr_path).astype(np.float32)[: len(lr_latent)]
            save_wav(out / f"{inp.stem}_hr_gt.wav",
                     pipe.decode_latent(hr), 44100)
    else:
        audio, sr = load_wav(inp, mono=True)
        if args.total_seconds:
            audio = audio[: int(args.total_seconds * sr)]
        wav = pipe.super_resolve_audio(
            audio, sr, jax.random.PRNGKey(0), args.steps, args.cfg_scale
        )
        save_wav(out / f"{inp.stem}_generated{cfg_suffix}.wav", wav, 44100)
    print(f"[infer] wrote results to {out}/")


if __name__ == "__main__":
    main()
