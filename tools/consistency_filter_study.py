"""Consistency-filter design study: Gaussian low-pass vs FFT cutoff.

Reproduces the reference's loss-design experiment
(/root/reference/test_consistency_methods.py) on TPU/XLA: which operator
should define "the low band must match the LR input" in the consistency
loss — a time-domain Gaussian low-pass (soft transition, needs sigma /
kernel-size tuning) or a hard rFFT cutoff (exact, parameter-free,
cutoff_ratio = 16k/44.1k ~ 0.36)?

Three measurements, matching the reference's:
  1. frequency response of both filters on white noise,
  2. constraint accuracy on a simulated HR / LR / noisy-pred triple,
  3. amortized per-call device timing (the reference used CUDA events;
     here both filters run INNER data-dependent iterations inside one
     jitted program — single-op timing through the tunnelled backend is
     pure dispatch overhead).

The production loss (losses/perceptual.py:consistency_loss) uses the FFT
cutoff, same conclusion as the reference (test_consistency_methods.py's
summary block).  Run: ``python tools/consistency_filter_study.py``.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

INNER = 200


def gaussian_kernel(kernel_size: int = 15, sigma: float = 2.5) -> jnp.ndarray:
    x = jnp.arange(kernel_size, dtype=jnp.float32) - kernel_size // 2
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_lowpass(latent: jnp.ndarray, kernel_size: int = 15,
                     sigma: float = 2.5) -> jnp.ndarray:
    """Depthwise time-domain Gaussian low-pass of [B, T, C] (time-major;
    the reference's conv1d-with-groups=C on [B, C, T])."""
    k = gaussian_kernel(kernel_size, sigma)
    C = latent.shape[-1]
    # depthwise conv: feature_group_count=C, kernel [K, 1, C]
    kern = jnp.tile(k[:, None, None], (1, 1, C))
    return jax.lax.conv_general_dilated(
        latent, kern,
        window_strides=(1,),
        padding=[(kernel_size // 2, kernel_size // 2)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=C,
    )


def frequency_cutoff(latent: jnp.ndarray,
                     cutoff_ratio: float = 0.36) -> jnp.ndarray:
    """Hard rFFT cutoff along time of [B, T, C] (fp32 island, like the
    production consistency loss)."""
    f = jnp.fft.rfft(latent.astype(jnp.float32), axis=1)
    nbins = f.shape[1]
    cut = int(nbins * cutoff_ratio)
    mask = (jnp.arange(nbins) < cut)[None, :, None]
    return jnp.fft.irfft(jnp.where(mask, f, 0.0), n=latent.shape[1], axis=1)


def frequency_response():
    print("=" * 72)
    print("1. Frequency response (white noise, T=1378)")
    print("=" * 72)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 1378, 9), jnp.float32)
    for name, fn in [("gaussian(k=15,s=2.5)", gaussian_lowpass),
                     ("fft_cutoff(0.36)", frequency_cutoff)]:
        y = fn(x)
        xf = np.abs(np.fft.rfft(np.asarray(x), axis=1)).mean(axis=(0, 2))
        yf = np.abs(np.fft.rfft(np.asarray(y), axis=1)).mean(axis=(0, 2))
        resp = yf / np.maximum(xf, 1e-9)
        nb = len(resp)
        marks = {r: resp[int(nb * r)] for r in (0.1, 0.3, 0.36, 0.4, 0.5)
                 if int(nb * r) < nb}
        desc = ", ".join(f"{r:.2f}Fs={v:.3f}" for r, v in marks.items())
        print(f"  {name:22s} |H|: {desc}")
    print("  -> the FFT cutoff is exactly 1 below 0.36Fs and 0 above; the")
    print("     Gaussian rolls off gradually (leaks above, attenuates below).")


def constraint_accuracy():
    print("\n" + "=" * 72)
    print("2. Constraint accuracy (HR / band-limited LR / noisy pred)")
    print("=" * 72)
    rs = np.random.RandomState(1)
    hr = jnp.asarray(rs.randn(2, 1378, 9) * 2.0, jnp.float32)
    lr = frequency_cutoff(hr, 0.36)  # LR is band-limited by construction
    pred = hr + jnp.asarray(rs.randn(2, 1378, 9) * 0.5, jnp.float32)

    loss_gauss = jnp.abs(gaussian_lowpass(pred) - lr).mean()
    pf = jnp.fft.rfft(pred, axis=1)
    lf = jnp.fft.rfft(lr, axis=1)
    cut = int(pf.shape[1] * 0.36)
    loss_fft = jnp.abs(pf[:, :cut] - lf[:, :cut]).mean()
    print(f"  gaussian-lowpass L1 vs LR : {float(loss_gauss):.6f}")
    print(f"  fft low-band complex L1   : {float(loss_fft):.6f}")

    hf = jnp.fft.rfft(hr, axis=1)
    low_err = jnp.abs(pf[:, :cut] - hf[:, :cut]).mean()
    high_err = jnp.abs(pf[:, cut:] - hf[:, cut:]).mean()
    print(f"  pred-vs-HR low-band error : {float(low_err):.6f}")
    print(f"  pred-vs-HR high-band error: {float(high_err):.6f}")
    print("  -> the FFT form constrains exactly the band the LR condition")
    print("     determines and leaves the generative band free.")


def device_timing():
    print("\n" + "=" * 72)
    print(f"3. Amortized device timing (B=28, {INNER} chained iters, "
          f"{jax.default_backend()})")
    print("=" * 72)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(28, 1378, 9), jnp.float32)

    def bench(fn):
        @jax.jit
        def loop(x):
            def body(_, v):
                # data-dependent chaining defeats CSE/hoisting
                return fn(v) * 0.999 + 0.001 * v
            return jax.lax.fori_loop(0, INNER, body, x)

        r = loop(x)
        float(r.mean())  # compile + completion barrier
        t0 = time.perf_counter()
        float(loop(x).mean())
        return (time.perf_counter() - t0) / INNER * 1e3

    tg = bench(gaussian_lowpass)
    tf = bench(frequency_cutoff)
    print(f"  gaussian-lowpass : {tg:.4f} ms/call")
    print(f"  fft cutoff       : {tf:.4f} ms/call")
    print(f"  ratio            : {tg / tf:.2f}x")


def main():
    frequency_response()
    constraint_accuracy()
    device_timing()
    print("\nConclusion (matches the reference's, "
          "test_consistency_methods.py:258-287): the hard FFT cutoff is the")
    print("right consistency operator — exact at 0.36 Fs, parameter-free, "
          "and cheap; losses/perceptual.py uses it.")


if __name__ == "__main__":
    main()
