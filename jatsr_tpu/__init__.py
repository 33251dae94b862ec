"""jatsr_tpu — TPU-native audio super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HUSRCF/JaTSR-Just-audio-transformer-super-solution ("JaT-AudioSR"):
a flow-matching Diffusion Transformer (GQA + RoPE + AdaLN-Zero) operating in
the 1024-channel continuous latent space of the Descript Audio Codec,
reconstructing full-band 44.1 kHz audio from 16 kHz low-passed input.

Layout convention: latent sequences are **time-major** `[B, T, C]`
(channels-last maps the 1024-wide channel axis onto TPU lanes).  The
reference uses `[B, C, T]`; convert at the boundary with
`jatsr_tpu.utils.layout`.

Subpackages
-----------
- ``configs``   — dataclass presets mirroring the reference "versions"
                  (v1, v2, v3, v3m2, v3mod2, v3mod3).
- ``models``    — the DiT family and the DAC codec port (Flax).
- ``ops``       — Pallas TPU kernels and XLA-first primitives (attention,
                  resampling, STFT).
- ``losses``    — flow-matching MSE/Charbonnier + Latent Perceptual stack.
- ``sampling``  — flow-matching interpolation / U-shaped t / Euler ODE CFG
                  sampler.
- ``train``     — pjit train step, schedules, Orbax checkpointing, loop.
- ``parallel``  — device mesh + sharding rules (DP/TP).
- ``data``      — offline preprocessing (chunk/LR-sim/encode/stats) and the
                  latent dataset loader.
- ``infer``     — chunked long-audio inference with crossfade stitching.
- ``metrics``   — LSD / Mel-L1/L2 evaluation (librosa-parity formulas).
- ``utils``     — audio I/O, layout, logging.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    _exports = {
        "DiT": ("jatsr_tpu.models", "DiT"),
        "DAC": ("jatsr_tpu.models.dac", "DAC"),
        "FlowSampler": ("jatsr_tpu.sampling", "FlowSampler"),
        "Trainer": ("jatsr_tpu.train.loop", "Trainer"),
        "InferencePipeline": ("jatsr_tpu.infer", "InferencePipeline"),
        "get_preset": ("jatsr_tpu.configs", "get_preset"),
        "list_presets": ("jatsr_tpu.configs", "list_presets"),
    }
    if name in _exports:
        import importlib

        mod, attr = _exports[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'jatsr_tpu' has no attribute {name!r}")
