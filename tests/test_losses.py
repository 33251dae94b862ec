"""Numerical parity of the loss stack against independent numpy
transcriptions of the reference formulas (train_ddp_v3mod2.py:53-321,
train_ddp_v3mod3.py:57-101)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import LossConfig
from jatsr_tpu.losses import (
    charbonnier_loss,
    consistency_loss,
    frequency_domain_loss,
    latent_perceptual_loss,
    multi_scale_loss,
    total_training_loss,
)

RS = np.random.RandomState(0)
B, T, C = 2, 90, 8  # T deliberately not a power of two (as in training: 1378)
PRED = RS.randn(B, T, C).astype(np.float32)
TARGET = RS.randn(B, T, C).astype(np.float32)
LR = RS.randn(B, T, C).astype(np.float32)


def np_freq_loss(pred, target, ratio=0.3):
    pf = np.fft.rfft(pred, axis=1)
    tf = np.fft.rfft(target, axis=1)
    eps = 1e-7
    log_mag = np.mean(np.abs(np.log(np.abs(pf) + eps) - np.log(np.abs(tf) + eps)))
    low = int(pf.shape[1] * ratio)
    phase = np.mean(np.abs(pf[:, :low] - tf[:, :low]))
    return log_mag + 0.1 * phase


def np_ms_loss(pred, target, scales=(1, 2, 4)):
    total = 0.0
    for s in scales:
        n = pred.shape[1] // s
        p = pred[:, : n * s].reshape(B, n, s, C).mean(axis=2)
        t = target[:, : n * s].reshape(B, n, s, C).mean(axis=2)
        total += np.mean(np.abs(p - t))
    return total / len(scales)


def np_consistency(pred, lr, strict=0.30, soft=0.36):
    pf = np.fft.rfft(pred, axis=1)
    lf = np.fft.rfft(lr, axis=1)
    nb = pf.shape[1]
    sb, fb = int(nb * strict), int(nb * soft)
    strict_l = np.mean(np.abs(pf[:, :sb] - lf[:, :sb]))
    band = fb - sb
    decay = np.linspace(1.0, 0.0, band)[None, :, None]
    trans = np.mean(np.abs(np.abs(pf[:, sb:fb]) - np.abs(lf[:, sb:fb])) * decay)
    return strict_l + trans


def test_charbonnier():
    got = float(charbonnier_loss(jnp.asarray(PRED), jnp.asarray(TARGET)))
    want = np.mean(np.sqrt((PRED - TARGET) ** 2 + 1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_frequency_domain_loss_matches_numpy():
    got = float(frequency_domain_loss(jnp.asarray(PRED), jnp.asarray(TARGET)))
    np.testing.assert_allclose(got, np_freq_loss(PRED, TARGET), rtol=1e-4)


def test_freq_loss_zero_for_identical():
    got = float(frequency_domain_loss(jnp.asarray(PRED), jnp.asarray(PRED)))
    assert got < 1e-6


def test_multi_scale_loss_matches_numpy():
    got = float(multi_scale_loss(jnp.asarray(PRED), jnp.asarray(TARGET)))
    np.testing.assert_allclose(got, np_ms_loss(PRED, TARGET), rtol=1e-5)


def test_consistency_loss_matches_numpy():
    got = float(consistency_loss(jnp.asarray(PRED), jnp.asarray(LR)))
    np.testing.assert_allclose(got, np_consistency(PRED, LR), rtol=1e-4)


def test_consistency_ignores_high_band():
    """Adding energy only above soft_cutoff*Fs must not change the loss."""
    pf = np.fft.rfft(PRED, axis=1)
    nb = pf.shape[1]
    fb = int(nb * 0.36)
    pf2 = pf.copy()
    pf2[:, fb + 1 :] *= 5.0  # boost the free high band
    pred2 = np.fft.irfft(pf2, n=T, axis=1).astype(np.float32)
    a = float(consistency_loss(jnp.asarray(PRED), jnp.asarray(LR)))
    b = float(consistency_loss(jnp.asarray(pred2), jnp.asarray(LR)))
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_combined_weights():
    cfg = LossConfig(use_latent_perceptual=True)
    perc, d = latent_perceptual_loss(
        jnp.asarray(PRED), jnp.asarray(TARGET), jnp.asarray(LR), cfg
    )
    want = (
        cfg.freq_weight * float(d["freq_loss"])
        + cfg.ms_weight * float(d["ms_loss"])
        + cfg.consistency_weight * float(d["consistency_loss"])
    )
    np.testing.assert_allclose(float(perc), want, rtol=1e-6)

    total, m = total_training_loss(
        jnp.asarray(PRED), jnp.asarray(TARGET), jnp.asarray(LR), cfg
    )
    np.testing.assert_allclose(
        float(total),
        float(m["recon_loss"]) + cfg.latent_loss_weight * float(perc),
        rtol=1e-6,
    )


@pytest.mark.parametrize("kind,expected", [("mse", "mse"), ("charbonnier", "ch")])
def test_reconstruction_switch(kind, expected):
    cfg = LossConfig(reconstruction=kind)
    total, _ = total_training_loss(
        jnp.asarray(PRED), jnp.asarray(TARGET), jnp.asarray(LR), cfg
    )
    if expected == "mse":
        want = np.mean((PRED - TARGET) ** 2)
    else:
        want = np.mean(np.sqrt((PRED - TARGET) ** 2 + 1e-6))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_bf16_inputs_are_promoted_to_fp32():
    """The fp32 island: feeding bf16 must not blow up phase accuracy vs the
    fp32 result beyond bf16 input-rounding noise."""
    a = jnp.asarray(PRED).astype(jnp.bfloat16)
    b = jnp.asarray(TARGET).astype(jnp.bfloat16)
    got = float(frequency_domain_loss(a, b))
    want = np_freq_loss(
        np.asarray(a.astype(jnp.float32)), np.asarray(b.astype(jnp.float32))
    )
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_buggy_freq_loss_matches_numpy():
    """Negative-control loss parity (ref train_ddp_v3mod1.py:53-112)."""
    from jatsr_tpu.losses.perceptual import buggy_frequency_domain_loss

    pf = np.fft.rfft(PRED, axis=1)
    tf = np.fft.rfft(TARGET, axis=1)
    complex_l1 = np.mean(np.abs(pf - tf))
    mag = np.mean(np.abs(np.abs(pf) - np.abs(tf)))
    w = np.linspace(1.0, 2.0, pf.shape[1])[None, :, None]
    wmag = np.mean(w * np.abs(np.abs(pf) - np.abs(tf)))
    want = 0.5 * complex_l1 + 0.2 * mag + 0.5 * wmag
    got = float(buggy_frequency_domain_loss(jnp.asarray(PRED),
                                            jnp.asarray(TARGET)))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_v3mod1_preset_uses_buggy_variant():
    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.losses.perceptual import buggy_frequency_domain_loss

    cfg = get_preset("v3mod1").loss
    assert cfg.freq_loss_variant == "buggy_v3mod1"
    assert cfg.consistency_weight == 0.0  # v3mod1 has no consistency term
    total, m = latent_perceptual_loss(
        jnp.asarray(PRED), jnp.asarray(TARGET), jnp.asarray(LR), cfg)
    want_freq = float(buggy_frequency_domain_loss(jnp.asarray(PRED),
                                                  jnp.asarray(TARGET)))
    np.testing.assert_allclose(float(m["freq_loss"]), want_freq, rtol=1e-6)
