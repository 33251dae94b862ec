"""Resampler properties: passband fidelity, anti-aliasing, length laws
(replaces torchaudio's sox resampler, ref prepare_dataset_v5.py:198-205)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.ops import resample, simulate_lr


def _sine(freq, sr, seconds=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_output_length_convention():
    x = jnp.zeros((1, 48000, 1))
    assert resample(x, 48000, 16000).shape == (1, 16000, 1)
    assert resample(x, 16000, 48000).shape == (1, 144000, 1)
    y = jnp.zeros((1, 44100, 1))
    assert resample(y, 44100, 48000).shape == (1, 48000, 1)
    # ceil convention on non-divisible lengths
    z = jnp.zeros((1, 1001, 1))
    assert resample(z, 48000, 16000).shape[1] == int(np.ceil(1001 / 3))


def test_passband_sine_preserved():
    """A 1 kHz tone must survive 48k->16k->48k nearly unchanged."""
    x = _sine(1000, 48000)
    y = np.asarray(simulate_lr(jnp.asarray(x[None, :, None]), 48000, 16000))[0, :, 0]
    mid = slice(2000, -2000)  # ignore filter edges
    err = np.abs(y[mid] - x[mid]).max()
    assert err < 0.02, err


def test_stopband_rejected():
    """A 10 kHz tone is above the 16 kHz Nyquist (8 kHz) and must be
    removed by the LR simulation."""
    x = _sine(10000, 48000)
    y = np.asarray(simulate_lr(jnp.asarray(x[None, :, None]), 48000, 16000))[0, :, 0]
    mid = slice(2000, -2000)
    assert np.abs(y[mid]).max() < 0.05


def test_fractional_441_to_48_round_trip():
    x = _sine(2000, 44100)
    up = resample(jnp.asarray(x[None, :, None]), 44100, 48000)
    back = np.asarray(resample(up, 48000, 44100))[0, :, 0]
    mid = slice(2000, 42000)
    assert np.abs(back[mid] - x[mid]).max() < 0.02


def test_simulate_lr_length_match():
    for T in [48000, 48001, 47999]:
        x = jnp.zeros((2, T, 1))
        assert simulate_lr(x).shape == (2, T, 1)


def test_dc_gain():
    """Unit DC input stays at unit level (filters are normalised)."""
    x = jnp.ones((1, 9600, 1))
    y = np.asarray(resample(x, 48000, 16000))[0, 100:-100, 0]
    np.testing.assert_allclose(y, 1.0, atol=1e-3)


def test_2d_and_3d_layouts_agree():
    x = np.random.RandomState(0).randn(2, 4800).astype(np.float32)
    a = np.asarray(resample(jnp.asarray(x), 48000, 16000))
    b = np.asarray(resample(jnp.asarray(x[..., None]), 48000, 16000))[..., 0]
    np.testing.assert_allclose(a, b, atol=1e-6)
