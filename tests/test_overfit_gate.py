"""The canonical end-to-end correctness gate (slow; opt-in).

Mirrors the reference's overfit-one-clip test
(tests/test_dac_overfit_v2.py:210-305): encode one real clip through the
codec, train the DiT to memorise it under the flow-matching objective,
sample from pure noise, and require near-perfect reconstruction —
correlation > 0.99 in latent space and > 0.95 on the decoded waveform.

Run with:  JATSR_RUN_SLOW=1 python -m pytest tests/test_overfit_gate.py -q
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import SamplerConfig, get_preset
from jatsr_tpu.models import DiT
from jatsr_tpu.models.dac import DAC, DACConfig
from jatsr_tpu.ops import simulate_lr
from jatsr_tpu.sampling import FlowSampler
from jatsr_tpu.train import create_train_state, make_train_step
from jatsr_tpu.train.step import Normalizer

pytestmark = pytest.mark.skipif(
    not os.environ.get("JATSR_RUN_SLOW"),
    reason="slow overfit gate; set JATSR_RUN_SLOW=1",
)


def test_overfit_one_clip_and_reconstruct():
    sr = 8000
    codec = DAC.random_init(
        0,
        DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                  decoder_rates=(4, 2), n_codebooks=2, codebook_size=64,
                  codebook_dim=4),
    )
    # one "real" clip: chirp + harmonics
    t = np.arange(sr * 2) / sr
    clip = (0.5 * np.sin(2 * np.pi * (200 + 100 * t) * t)
            + 0.2 * np.sin(2 * np.pi * 900 * t)).astype(np.float32)
    x = jnp.asarray(clip[None, :, None])
    lr_audio = simulate_lr(x, sr, sr // 2)
    z_hr, _ = codec.encode(x)
    z_lr, _ = codec.encode(lr_audio)
    hr = np.asarray(z_hr)  # [1, T, 32]
    lr = np.asarray(z_lr)
    C = hr.shape[-1]

    preset = get_preset("tiny")
    mcfg = dataclasses.replace(preset.model, input_channels=C,
                               cond_channels=C, dropout=0.0)
    tcfg = dataclasses.replace(preset.train, lr=2e-3, warmup_steps=20,
                               condition_noise_ratio=0.0)
    model = DiT(mcfg)
    state = create_train_state(model, tcfg, 3000,
                               (jnp.asarray(hr), jnp.asarray(lr)))
    mu, sd = hr.mean(axis=(0, 1)), hr.std(axis=(0, 1)) + 1e-6
    mul, sdl = lr.mean(axis=(0, 1)), lr.std(axis=(0, 1)) + 1e-6
    norm = Normalizer(mu, sd, mul, sdl)
    step = jax.jit(make_train_step(preset.loss, tcfg, norm),
                   donate_argnums=(0,))

    hr_j, lr_j = jnp.asarray(hr), jnp.asarray(lr)
    first = last = None
    for i in range(800):
        state, m = step(state, hr_j, lr_j)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < 0.05 * first, (first, last)

    sampler = FlowSampler(
        lambda p, z, t_, c: model.apply({"params": p}, z, t_, c),
        SamplerConfig(num_steps=50), params=state.params,
    )
    gen_norm = sampler(jax.random.PRNGKey(0),
                       jnp.asarray(norm.norm_lr(lr_j)))
    gen = np.asarray(norm.denorm_hr(gen_norm))

    corr_latent = np.corrcoef(gen.ravel(), hr.ravel())[0, 1]
    assert corr_latent > 0.99, corr_latent

    wav_gen = np.asarray(codec.decode(jnp.asarray(gen)))[0, :, 0]
    wav_gt = np.asarray(codec.decode(jnp.asarray(hr)))[0, :, 0]
    corr_wav = np.corrcoef(wav_gen, wav_gt)[0, 1]
    assert corr_wav > 0.95, corr_wav
    print(f"overfit gate: loss {first:.3f}->{last:.4f}, "
          f"latent corr {corr_latent:.4f}, wav corr {corr_wav:.4f}")
