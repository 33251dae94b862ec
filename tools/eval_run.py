"""End-to-end quality evaluation of a trained run.

Glues together what the reference does manually across infer_test_v3m2.py,
calculate_metrics.py and plot_audio_spectrum.py: for N validation songs,
generate HR latents from the LR condition, decode generated/GT/LR audio,
compute LSD + Mel L1/L2 (+ multi-scale) against GT and against the
LR-input baseline, write a JSON report and comparison spectrograms.

Usage:
    python tools/eval_run.py --run-dir checkpoints/v3mod2/<ts> \
        --preset v3mod2 --data-dir data_processed \
        [--dac-weights dac.pth] [--num-songs 4] [--steps 50]
        [--cfg-scale 3.0] [--seconds 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--preset", default="v3mod2")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--dac-weights", default=None)
    ap.add_argument("--num-songs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg-scale", type=float, default=3.0)
    ap.add_argument("--cfg-sweep", type=float, nargs="*", default=None,
                    help="evaluate several CFG scales (overrides --cfg-scale)")
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--int8", action="store_true",
                    help="evaluate the int8 W8A8 serving path (quality "
                         "gate for making it the bench default)")
    ap.add_argument("--quantize-head", action="store_true",
                    help="extend int8 to final_proj")
    ap.add_argument("--scores-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="attention score-matrix storage dtype (quality "
                         "gate for the bf16-scores serving knob)")
    ap.add_argument("--fused-prologue", action="store_true",
                    help="fold norm+AdaLN+quant into the qkv/mlp_in "
                         "kernels (implies the full --fused-mlp stack "
                         "and align_n)")
    ap.add_argument("--fused-mlp", action="store_true",
                    help="Pallas fused dot+GELU+requant MLP (implies the "
                         "int8_static weight layout; quality gate for the "
                         "fused serving MLP)")
    ap.add_argument("--attention", default="xla",
                    choices=["xla", "pallas", "pallas2", "flash"])
    ap.add_argument("--gelu", default="tanh",
                    choices=["tanh", "erf", "sigmoid"],
                    help="in-kernel GELU form for --fused-mlp")
    ap.add_argument("--solver", default="euler", choices=["euler", "heun"],
                    help="ODE solver (heun = 2nd order, 2 model calls per "
                         "step: heun-25 costs the same 50 NFE as euler-50)")
    ap.add_argument("--cfg-interval", type=float, nargs=2, default=(0.0, 1.0),
                    metavar=("LO", "HI"),
                    help="apply CFG only for t in [LO, HI) of the schedule")
    ap.add_argument("--fused-decode", action="store_true",
                    help="decode through the fused Pallas residual-unit "
                         "kernels (the --fused-decode serving knob)")
    ap.add_argument("--snake-bf16", action="store_true",
                    help="fused decode: snake transcendentals in bf16 "
                         "(r5 VPU lever — gate condition)")
    ap.add_argument("--unfused-gt-decode", action="store_true",
                    help="with --fused-decode: decode the ground-truth/LR "
                         "reference audio through the UNFUSED XLA decoder "
                         "while generated audio uses the fused kernels, so "
                         "systematic decoder-numerics errors cannot cancel "
                         "in the metric deltas (ADVICE r4 #1)")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0],
                    help="sampler seeds; metrics are averaged over seeds "
                         "and the report carries mean±std (VERDICT r3 #4: "
                         "schedule-changing knobs need multi-seed "
                         "confidence intervals)")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.fused_prologue:
        args.fused_mlp = True
    if args.snake_bf16:
        from jatsr_tpu.ops import dac_kernels as _dk

        _dk.set_snake_compute_dtype("bfloat16")

    from jatsr_tpu.utils.runtime import select_platform

    select_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.data import load_stats
    from jatsr_tpu.infer import InferencePipeline
    from jatsr_tpu.metrics import (
        calculate_lsd,
        calculate_mel_loss,
        calculate_multi_scale_mel_loss,
        grade_quality,
    )
    from jatsr_tpu.metrics.plots import plot_comparison
    from jatsr_tpu.models import DiT
    from jatsr_tpu.models.dac import DAC
    from jatsr_tpu.train import create_train_state
    from jatsr_tpu.train.checkpoint import CheckpointManager
    from jatsr_tpu.train.step import Normalizer
    from jatsr_tpu.utils import save_wav

    preset = get_preset(args.preset)
    mcfg = dataclasses.replace(preset.model, scores_dtype=args.scores_dtype,
                               attention_impl=args.attention)
    if args.int8:
        mcfg = dataclasses.replace(mcfg, matmul_precision="int8",
                                   quantize_head=args.quantize_head)
    # Checkpoints use the unquantized param layout: restore with the plain
    # model, then (for the static/fused path) swap the model and pre-
    # quantize the weights once — same flow as cli/infer.py.
    model = DiT(mcfg if not args.fused_mlp else preset.model)
    C = preset.model.input_channels
    dummy = jnp.zeros((1, 8, C), jnp.float32)
    state = create_train_state(model, preset.train, 1, (dummy, dummy))
    state, meta = CheckpointManager(args.run_dir).restore(args.checkpoint,
                                                         state)
    if args.fused_mlp:
        from jatsr_tpu.ops.quant import quantize_params_static

        mcfg = dataclasses.replace(
            mcfg, matmul_precision="int8_static", fused_mlp=True,
            # bit-identical merge; required for the flash v3.1/v3.2
            # kernel branches, so gates exercise the bench config
            fused_qkv=True,
            fused_prologue=args.fused_prologue,
            align_n=args.fused_prologue,
            gelu_impl=args.gelu,
            dropout=0.0, drop_path_rate=0.0,
        )
        model = DiT(mcfg)
        shapes = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                dummy, jnp.zeros((1,), jnp.float32), dummy)["params"])
        state = state.replace(
            params=quantize_params_static(state.params, shapes))
        print("[eval] fused int8_static MLP serving path")
    if args.dac_weights:
        from jatsr_tpu.models.dac.convert import load_torch_checkpoint

        codec_source = args.dac_weights
        codec = DAC(load_torch_checkpoint(args.dac_weights),
                    fused_res_units=args.fused_decode)
    else:
        print("[warn] RANDOM codec weights — quality numbers meaningless")
        codec_source = "random_init(0)"
        codec = DAC.random_init(0, fused_res_units=args.fused_decode)
    # Asymmetric-decode gate mode: reference audio through the unfused XLA
    # decoder, generated audio through the kernels under test.
    codec_ref = codec
    if args.unfused_gt_decode and args.fused_decode:
        if args.dac_weights:
            codec_ref = DAC(load_torch_checkpoint(args.dac_weights),
                            fused_res_units=False)
        else:
            codec_ref = DAC.random_init(0, fused_res_units=False)

    stats_path = Path(args.data_dir) / preset.data.stats_file
    norm = Normalizer(*load_stats(str(stats_path)))
    scfg = dataclasses.replace(preset.sampler, num_steps=args.steps,
                               cfg_scale=args.cfg_scale,
                               cfg_interval=tuple(args.cfg_interval),
                               solver=args.solver)
    pipe = InferencePipeline(model, state.params, norm, codec, scfg)
    pipe_ref = (pipe if codec_ref is codec else
                InferencePipeline(model, state.params, norm, codec_ref, scfg))

    out_dir = Path(args.output_dir or Path(args.run_dir) / "eval")
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = int(args.seconds * 44100 / 512)

    songs = sorted(Path(args.data_dir, "val").glob("*.hr.npy"))
    songs = songs[: args.num_songs]
    scales = args.cfg_sweep if args.cfg_sweep else [args.cfg_scale]
    results = []
    for hr_path in songs:
        name = hr_path.name.replace(".hr.npy", "")
        hr = np.load(hr_path).astype(np.float32)[:frames]
        lr = np.load(str(hr_path).replace(".hr.npy", ".lr.npy")).astype(
            np.float32
        )[:frames]
        per_scale = {}
        for s in scales[1:]:
            g = pipe.super_resolve_latent(lr, jax.random.PRNGKey(0),
                                          args.steps, s)
            per_scale[f"cfg_{s}"] = g
        wav_gt = pipe_ref.decode_latent(hr)
        wav_lr = pipe_ref.decode_latent(lr)

        def metrics(a, b):
            lsd, _ = calculate_lsd(a, b)
            l1, l2, _, _ = calculate_mel_loss(a, b)
            ms1, ms2, _ = calculate_multi_scale_mel_loss(a, b)
            return dict(lsd=lsd, mel_l1=l1, mel_l2=l2, ms_mel_l1=ms1,
                        ms_mel_l2=ms2)

        # One generation per sampler seed; per-song metrics are the mean
        # over seeds, with the per-seed rows kept for the std estimate.
        per_seed = []
        wav_gen = None
        for seed in args.seeds:
            gen = pipe.super_resolve_latent(lr, jax.random.PRNGKey(seed),
                                            args.steps, scales[0])
            w = pipe.decode_latent(gen)
            if wav_gen is None:
                wav_gen = w  # first seed's audio saved/plotted below
            per_seed.append(metrics(w, wav_gt))
        m_gen = {k: float(np.mean([m[k] for m in per_seed]))
                 for k in per_seed[0]}
        m_lr = metrics(wav_lr, wav_gt)
        entry = {
            "song": name,
            "cfg_scale": scales[0],
            "generated_vs_gt": m_gen,
            "lr_vs_gt_baseline": m_lr,
            "grade": grade_quality(m_gen["lsd"], m_gen["mel_l1"]),
        }
        if len(args.seeds) > 1:
            entry["per_seed"] = [
                {"seed": s, **m} for s, m in zip(args.seeds, per_seed)]
        for key, g in per_scale.items():
            entry[key] = metrics(pipe.decode_latent(g), wav_gt)
            print(f"[eval]   {name} {key}: LSD {entry[key]['lsd']:.2f} dB, "
                  f"Mel L1 {entry[key]['mel_l1']:.2f}")
        results.append(entry)
        save_wav(out_dir / f"{name}_generated.wav", wav_gen, 44100)
        plot_comparison(
            [("generated", wav_gen), ("ground truth", wav_gt),
             ("LR input", wav_lr)],
            44100, out_dir / f"{name}_spectra.png",
        )
        print(f"[eval] {name}: LSD {m_gen['lsd']:.2f} dB "
              f"(LR baseline {m_lr['lsd']:.2f}), "
              f"Mel L1 {m_gen['mel_l1']:.2f} ({m_lr['mel_l1']:.2f})")

    def avg(key1, key2):
        return float(np.mean([r[key1][key2] for r in results]))

    def spread(key2):
        """std over all (song, seed) generated-vs-GT rows."""
        rows = []
        for r in results:
            rows.extend(m[key2] for m in r.get(
                "per_seed", [r["generated_vs_gt"]]))
        return float(np.std(rows))

    summary = {
        "checkpoint": f"{args.run_dir}/{args.checkpoint}",
        "step": meta["global_step"],
        "num_songs": len(results),
        "steps": args.steps,
        "cfg_scale": args.cfg_scale,
        # schedule provenance (VERDICT r3 #9): gated-vs-parity results
        # must be unambiguous in saved artifacts
        "cfg_interval": list(args.cfg_interval),
        "solver": args.solver,
        "seeds": list(args.seeds),
        "fused_decode": bool(args.fused_decode),
        "snake_compute": "bfloat16" if args.snake_bf16 else "float32",
        # codec provenance (ADVICE r4 #1): which weights decoded the audio,
        # and whether GT/LR went through the unfused parity decoder.
        "codec_source": codec_source,
        "gt_decode": ("unfused" if codec_ref is not codec else
                      ("fused" if args.fused_decode else "unfused")),
        "avg_generated": {k: avg("generated_vs_gt", k)
                          for k in ("lsd", "mel_l1", "mel_l2")},
        "std_generated": {k: spread(k)
                          for k in ("lsd", "mel_l1", "mel_l2")},
        "avg_lr_baseline": {k: avg("lr_vs_gt_baseline", k)
                            for k in ("lsd", "mel_l1", "mel_l2")},
        "songs": results,
    }
    (out_dir / "report.json").write_text(json.dumps(summary, indent=2))
    print(f"[eval] report: {out_dir}/report.json")


if __name__ == "__main__":
    main()
