"""Polyphase windowed-sinc resampling as a single XLA convolution.

The reference resamples with torchaudio/sox (``AF.resample``) for the
48k↔16k LR simulation and the 44.1k path (prepare_dataset_v5.py:198-205,
calculate_metrics.py:11-15).  This implements the same algorithm natively:
a bank of ``new_freq`` polyphase filters built from a Hann-windowed sinc
(lowpass_filter_width=6, rolloff=0.99 — torchaudio's defaults), applied as
one strided conv on the MXU.  Kernels are precomputed on host in float64 and
cached per (orig, new) pair.

For 48000→16000 this reduces to a 3:1 decimator (gcd fold), for
44100↔48000 to a 147:160 polyphase — all the reference's paths.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=32)
def _sinc_kernel(orig: int, new: int, lowpass_filter_width: int = 6,
                 rolloff: float = 0.99):
    """Polyphase Hann-windowed sinc bank.

    Returns:
        (kernel [K, 1, new] float32, width int) with the conv convention of
        ``layers.conv1d`` (WIO, channels-last).
    """
    assert orig > 0 and new > 0
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    # time grid of one filter, in units of the input rate
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    # one row per output phase
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale  # [new, K]
    # Cache host-side numpy only: this function may be hit inside a jit
    # trace, and caching a traced jnp constant would leak the tracer.
    return np.ascontiguousarray(kernel.T[:, None, :], np.float32), width


def resample(x: jax.Array, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jax.Array:
    """Resample ``[B, T, C]`` (or ``[B, T]``) along time.

    Output length is ``ceil(T * new/orig)`` (torchaudio convention).
    """
    if orig_freq == new_freq:
        return x
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    B, T, C = x.shape
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    kernel, width = _sinc_kernel(orig, new, lowpass_filter_width, rolloff)

    # fold channels into batch; conv over a single input channel
    xc = x.transpose(0, 2, 1).reshape(B * C, T, 1)
    out = lax.conv_general_dilated(
        xc, jnp.asarray(kernel),
        window_strides=(orig,),
        padding=[(width, width + orig)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B*C, T', new] — phase-major interleave
    out = out.reshape(B * C, -1)
    target_len = int(math.ceil(new * T / orig))
    out = out[:, :target_len]
    out = out.reshape(B, C, target_len).transpose(0, 2, 1)
    return out[..., 0] if squeeze else out


def simulate_lr(x: jax.Array, high_sr: int = 48000,
                low_sr: int = 16000) -> jax.Array:
    """LR simulation: down- then up-sample, length-matched to the input
    (ref prepare_dataset_v5.py:203-205)."""
    T = x.shape[1] if x.ndim == 3 else x.shape[-1]
    lr = resample(resample(x, high_sr, low_sr), low_sr, high_sr)
    t_axis = 1 if x.ndim == 3 else -1
    cur = lr.shape[t_axis]
    if cur < T:
        pad = [(0, 0)] * x.ndim
        pad[t_axis] = (0, T - cur)
        lr = jnp.pad(lr, pad)
    elif cur > T:
        lr = lax.slice_in_dim(lr, 0, T, axis=t_axis)
    return lr
