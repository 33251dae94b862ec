"""Overfit gate at PRODUCTION geometry on the real TPU chip.

The reference's canonical go/no-go (tests/test_dac_overfit_v2.py:210-305,
QUICK_COMMANDS.txt:79-84) run at the real sizes: 1024-channel DAC
(rates 2/4/8/8, random-init — published weights are not obtainable in this
environment), v1-size DiT (60 M), one 16 s 44.1 kHz clip (1378 latent
frames).  Gates: train loss < 0.05x initial, generated-latent correlation
> 0.99, decoded-waveform correlation > 0.95.

Usage: python tools/overfit_gate_tpu.py [--steps N]
Writes results to PERF-gate JSON on stdout; exits nonzero on gate failure.
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=None,
                    help="default 1e-3 for the 60 M v1 gate; 2e-4 for "
                         "766 M presets (1e-3 at 766 M sits on an Adam "
                         "noise floor ~0.40 — measured r5 queue)")
    ap.add_argument("--preset", default="v1",
                    help="v1 = 60 M (the round-3 gate); v3mod2 = the 766 M "
                         "flagship at production geometry with the full "
                         "latent-perceptual loss stack (VERDICT r4 #2a)")
    ap.add_argument("--resume-midway", action="store_true",
                    help="at steps/2: checkpoint, rebuild a FRESH train "
                         "state, restore, continue — proves 766 M-scale "
                         "checkpoint/resume on chip (VERDICT r4 #2c)")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON here (reports/...)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (cpu smoke / tpu)")
    args = ap.parse_args()

    from jatsr_tpu.utils.runtime import select_platform

    select_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from jatsr_tpu.configs import SamplerConfig, get_preset
    from jatsr_tpu.models import DiT, count_params
    from jatsr_tpu.models.dac import DAC, DACConfig
    from jatsr_tpu.ops import simulate_lr
    from jatsr_tpu.sampling import FlowSampler
    from jatsr_tpu.train import create_train_state, make_train_step
    from jatsr_tpu.train.step import Normalizer

    print(f"backend: {jax.default_backend()}")
    sr = 44100
    codec = DAC.random_init(0, DACConfig())  # production 1024-ch geometry

    # one 16 s "song": chirp + harmonics + noise floor
    dur = 16.0
    t = np.arange(int(sr * dur)) / sr
    clip = (
        0.4 * np.sin(2 * np.pi * (220 + 30 * t) * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
        + 0.1 * np.sin(2 * np.pi * 4000 * t)
        + 0.02 * np.random.RandomState(0).randn(t.size)
    ).astype(np.float32)
    x = jnp.asarray(clip[None, :, None])

    t0 = time.time()
    lr_audio = simulate_lr(x, sr, 11025)
    z_hr, _ = codec.encode(x)
    z_lr, _ = codec.encode(lr_audio)
    hr = np.asarray(z_hr)
    lr_lat = np.asarray(z_lr)
    print(f"encoded: hr {hr.shape} in {time.time()-t0:.1f}s")
    assert hr.shape[1] == int(dur * sr / 512) + (1 if (dur*sr) % 512 else 0) \
        or hr.shape[1] in (1378, 1379), hr.shape

    B = args.batch
    hr_b = np.repeat(hr, B, axis=0)
    lr_b = np.repeat(lr_lat, B, axis=0)

    preset = get_preset(args.preset)  # v1 = 60 M; v3mod2 = 766 M flagship
    lr_eff = args.lr if args.lr is not None else (
        1e-3 if args.preset == "v1" else 2e-4)
    mcfg = dataclasses.replace(preset.model, dropout=0.0, drop_path_rate=0.0)
    tcfg = dataclasses.replace(preset.train, lr=lr_eff, warmup_steps=30,
                               condition_noise_ratio=0.0, batch_size=B,
                               cfg_dropout_prob=0.0)
    model = DiT(mcfg)
    state = create_train_state(model, tcfg, args.steps * 2,
                               (jnp.asarray(hr_b), jnp.asarray(lr_b)))
    print(f"model: {count_params(state.params)/1e6:.1f}M params")
    mu, sd = hr.mean(axis=(0, 1)), hr.std(axis=(0, 1)) + 1e-6
    mul, sdl = lr_lat.mean(axis=(0, 1)), lr_lat.std(axis=(0, 1)) + 1e-6
    norm = Normalizer(mu, sd, mul, sdl)
    step = jax.jit(make_train_step(preset.loss, tcfg, norm),
                   donate_argnums=(0,))

    # Irreducible loss floor at perfect memorization: the v3mod2 stack's
    # HybridConsistencyLoss compares pred against the *LR* latent
    # (ref train_ddp_v3mod2.py:172-271), so total loss at pred == target
    # is NOT zero — at 766 M the r5 queue measured a 0.40 plateau that
    # is almost entirely this floor.  Gate on the floor-adjusted ratio
    # (and on the pure reconstruction term), matching the reference
    # gate's intent (tests/test_dac_overfit_v2.py:210-305: plain-MSE
    # loss < 0.05x initial).
    from jatsr_tpu.losses.perceptual import total_training_loss

    hr_n = norm.norm_hr(jnp.asarray(hr, jnp.float32))
    lr_n = norm.norm_lr(jnp.asarray(lr_lat, jnp.float32))
    floor_loss, floor_m = jax.jit(total_training_loss, static_argnums=3)(
        hr_n, hr_n, lr_n, preset.loss)
    floor = float(floor_loss)
    print(f"loss floor at pred==target: {floor:.5f} "
          f"(recon {float(floor_m['recon_loss']):.2e})")

    hr_j, lr_j = jnp.asarray(hr_b), jnp.asarray(lr_b)
    t0 = time.time()
    first = None
    recon_first = None
    resumed = None
    half = args.steps // 2
    for i in range(args.steps):
        state, m = step(state, hr_j, lr_j)
        if first is None:
            first = float(m["loss"])
            recon_first = float(m["recon_loss"])
            print(f"step 0: loss {first:.4f} recon {recon_first:.4f} "
                  f"(compile {time.time()-t0:.0f}s)")
        elif (i + 1) % 100 == 0:
            print(f"step {i+1}: loss {float(m['loss']):.5f} "
                  f"recon {float(m['recon_loss']):.5f}")
        if args.resume_midway and i + 1 == half:
            # Full checkpoint -> FRESH state -> restore -> continue: the
            # 766 M-scale resume evidence VERDICT r4 #2c asks for.  The
            # restored loss must continue the curve (bit-exact resume is
            # covered by tests/test_trainer_and_infer.py at small scale;
            # here the point is Orbax round-tripping 766 M params + bf16
            # Adam moments + PRNG on the real chip).
            import tempfile

            from jatsr_tpu.train.checkpoint import CheckpointManager

            loss_before = float(m["loss"])
            ckdir = tempfile.mkdtemp(prefix="overfit_resume_")
            cm = CheckpointManager(ckdir)
            cm.save("last", state, epoch=0, best_val_loss=loss_before)
            # Free the live state BEFORE building the restore target, and
            # build that target abstractly (eval_shape): at 766 M two
            # concrete train states (params + Adam moments) plus Orbax's
            # restore shards exceed a 16 GB chip — the r5 queue's first
            # attempt OOM'd exactly here.  restore() only reads the
            # template's shapes/dtypes and static fields (tx, apply_fn).
            state = None
            fresh = jax.eval_shape(
                lambda h, l: create_train_state(model, tcfg, args.steps * 2,
                                                (h, l)),
                hr_j, lr_j)
            state, meta = cm.restore("last", fresh)
            state, m = step(state, hr_j, lr_j)
            loss_after = float(m["loss"])
            resumed = {"at_step": half, "loss_before": round(loss_before, 5),
                       "loss_after_restore_step": round(loss_after, 5)}
            print(f"[resume] ckpt at step {half}: loss {loss_before:.5f} "
                  f"-> restored+1 step {loss_after:.5f}")
    last = float(m["loss"])
    recon_last = float(m["recon_loss"])

    sampler = FlowSampler(
        lambda p, z, tt, c: model.apply({"params": p}, z, tt, c),
        SamplerConfig(num_steps=50), params=state.params,
    )
    gen_norm = sampler(jax.random.PRNGKey(0),
                       jnp.asarray(norm.norm_lr(jnp.asarray(lr_lat))))
    gen = np.asarray(norm.denorm_hr(gen_norm))

    corr_latent = float(np.corrcoef(gen.ravel(), hr.ravel())[0, 1])
    wav_gen = np.asarray(codec.decode(jnp.asarray(gen)))[0, :, 0]
    wav_gt = np.asarray(codec.decode(jnp.asarray(hr)))[0, :, 0]
    corr_wav = float(np.corrcoef(wav_gen, wav_gt)[0, 1])

    adj_ratio = (last - floor) / max(first - floor, 1e-9)
    recon_ratio = recon_last / max(recon_first, 1e-9)
    ok = (adj_ratio < 0.05) and recon_ratio < 0.05 \
        and corr_latent > 0.99 and corr_wav > 0.95
    result = {
        "gate": "overfit_production_geometry",
        "backend": jax.default_backend(),
        "loss_first": round(first, 4), "loss_last": round(last, 5),
        "loss_floor": round(floor, 5),
        "loss_ratio_floor_adj": round(adj_ratio, 5),
        "recon_first": round(recon_first, 4),
        "recon_last": round(recon_last, 6),
        "recon_ratio": round(recon_ratio, 5),
        "latent_corr": round(corr_latent, 5),
        "wav_corr": round(corr_wav, 5),
        "lr": lr_eff,
        "steps": args.steps, "ok": ok,
    }
    if resumed is not None:
        result["resume"] = resumed
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
