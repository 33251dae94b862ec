"""Descript Audio Codec (44 kHz) — TPU-native JAX port.

The reference consumes DAC through the external ``dac`` package
(prepare_dataset_v5.py:107-110, infer_test_v3m2.py:97-104): encoder →
residual vector quantizer → decoder, hop 512, 1024-channel continuous
latent.  This is a from-scratch functional JAX implementation of the same
architecture (convs channels-last on the MXU, Snake activations on the VPU),
with a converter for the published PyTorch weights (convert.py).

Design notes
------------
- Pure functions over an explicit parameter pytree — the codec is used
  frozen (encode for preprocessing, decode for inference), so there is no
  need for a Module abstraction; ``jax.jit`` wraps the public entry points.
- The quantizer search runs as one batched matmul per codebook over
  L2-normalised vectors (the argmin-of-distance formulation reduces to an
  argmax of cosine similarity on the MXU).
- ``encode`` returns the **quantised continuous latent z** [B, T, 1024] —
  this is what the reference stores as ``hr_latent``/``lr_latent`` and what
  ``decode`` consumes (infer_test_v3m2.py:409-414).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv1d, conv1d_transpose, snake


@dataclass(frozen=True)
class DACConfig:
    sample_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8

    @property
    def latent_dim(self) -> int:
        return self.encoder_dim * (2 ** len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


# ---------------------------------------------------------------------------
# Parameter initialisation (random; real use loads converted torch weights)
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout):
    w_key, _ = jax.random.split(key)
    fan_in = cin * k
    scale = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(w_key, (k, cin, cout), jnp.float32,
                                -scale, scale),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _res_unit_init(key, dim, dilation):
    k1, k2 = jax.random.split(key)
    return {
        "alpha1": jnp.ones((dim,), jnp.float32),
        "conv1": _conv_init(k1, 7, dim, dim),
        "alpha2": jnp.ones((dim,), jnp.float32),
        "conv2": _conv_init(k2, 1, dim, dim),
    }


def init_params(key: jax.Array, cfg: DACConfig) -> Dict:
    keys = iter(jax.random.split(key, 256))
    params: Dict = {"encoder": {}, "quantizer": {}, "decoder": {}}

    # Encoder.
    enc = params["encoder"]
    d = cfg.encoder_dim
    enc["conv_in"] = _conv_init(next(keys), 7, 1, d)
    for i, stride in enumerate(cfg.encoder_rates):
        d *= 2
        blk = {}
        for j, dil in enumerate((1, 3, 9)):
            blk[f"res_{j}"] = _res_unit_init(next(keys), d // 2, dil)
        blk["alpha"] = jnp.ones((d // 2,), jnp.float32)
        blk["down"] = _conv_init(next(keys), 2 * stride, d // 2, d)
        enc[f"block_{i}"] = blk
    enc["alpha_out"] = jnp.ones((d,), jnp.float32)
    enc["conv_out"] = _conv_init(next(keys), 3, d, cfg.latent_dim)

    # Residual VQ.
    for q in range(cfg.n_codebooks):
        params["quantizer"][f"vq_{q}"] = {
            "in_proj": _conv_init(next(keys), 1, cfg.latent_dim,
                                  cfg.codebook_dim),
            "out_proj": _conv_init(next(keys), 1, cfg.codebook_dim,
                                   cfg.latent_dim),
            "codebook": jax.random.normal(
                next(keys), (cfg.codebook_size, cfg.codebook_dim), jnp.float32
            ),
        }

    # Decoder.
    dec = params["decoder"]
    ch = cfg.decoder_dim
    dec["conv_in"] = _conv_init(next(keys), 7, cfg.latent_dim, ch)
    for i, stride in enumerate(cfg.decoder_rates):
        cin, cout = ch // (2**i), ch // (2 ** (i + 1))
        blk = {
            "alpha": jnp.ones((cin,), jnp.float32),
            "up": _conv_init(next(keys), 2 * stride, cin, cout),
        }
        for j, dil in enumerate((1, 3, 9)):
            blk[f"res_{j}"] = _res_unit_init(next(keys), cout, dil)
        dec[f"block_{i}"] = blk
    last = ch // (2 ** len(cfg.decoder_rates))
    dec["alpha_out"] = jnp.ones((last,), jnp.float32)
    dec["conv_out"] = _conv_init(next(keys), 7, last, 1)
    return params


# ---------------------------------------------------------------------------
# Forward functions
# ---------------------------------------------------------------------------


def _res_unit(p, x, dilation, fused=False):
    """Snake -> dilated 7-conv -> Snake -> 1x1 conv, residual add.  With
    padding 3*dilation the length is preserved, so no trim is needed.

    ``fused=True`` routes eligible shapes (C <= 384, fp32) through the
    Pallas fused kernel (ops/dac_kernels.py): one HBM round-trip for the
    whole unit instead of XLA's channels-major conv pipeline with its
    im2col materialisation and relayout reshapes — the profiled decode
    bottleneck at the post-upsample tail stages."""
    if fused and x.dtype == jnp.float32:
        from ...ops import dac_kernels as dk

        b, t, c = x.shape
        interp = jax.default_backend() not in ("tpu",)
        if dk.res_unit_supported(c, t, dilation) and \
                (not interp or dk.ALLOW_INTERPRET_DISPATCH):
            # One pallas_call: the batch dim rides the kernel grid.
            return dk.res_unit_fused(
                x, p["conv1"]["w"], p["conv1"]["b"],
                p["conv2"]["w"], p["conv2"]["b"],
                p["alpha1"], p["alpha2"],
                dilation=dilation, interpret=interp,
            )
    y = snake(x, p["alpha1"])
    y = conv1d(y, p["conv1"]["w"], p["conv1"]["b"], padding=3 * dilation,
               dilation=dilation)
    y = snake(y, p["alpha2"])
    y = conv1d(y, p["conv2"]["w"], p["conv2"]["b"])
    return x + y


def _snake_upsample(blk, x, stride):
    """snake -> conv_transpose through the polyphase Pallas kernel
    (ops/dac_kernels.snake_conv_transpose_fused) when the stage is
    eligible; None falls back to the XLA dilated-conv lowering (which
    streams zero-stuffed [T*s, Cin] tensors per tap — PERF.md round 4)."""
    from ...ops import dac_kernels as dk

    b, t, c = x.shape
    w = blk["up"]["w"]
    interp = jax.default_backend() not in ("tpu",)
    if not dk.conv_transpose_supported(c, w.shape[2], stride, w.shape[0], t) \
            or (interp and not dk.ALLOW_INTERPRET_DISPATCH):
        return None
    return dk.snake_conv_transpose_fused(
        x, w, blk["up"]["b"], blk["alpha"], stride=stride,
        padding=math.ceil(stride / 2), output_padding=stride % 2,
        interpret=interp)


def _res_stage(blk, x):
    """All three residual units of a decoder block through ONE Pallas
    kernel (ops/dac_kernels.res_stage_fused): the activation crosses HBM
    twice per stage instead of six times, and the per-unit pad/slice
    passes disappear.  Returns None when the shape is ineligible (caller
    falls back to per-unit kernels)."""
    from ...ops import dac_kernels as dk

    b, t, c = x.shape
    interp = jax.default_backend() not in ("tpu",)
    if not dk.res_stage_supported(c, t) or \
            (interp and not dk.ALLOW_INTERPRET_DISPATCH):
        return None
    units = [blk[f"res_{j}"] for j in range(3)]
    w7s = jnp.stack([u["conv1"]["w"] for u in units])
    b7s = jnp.stack([u["conv1"]["b"] for u in units])
    w1s = jnp.stack([u["conv2"]["w"].reshape(c, c) for u in units])
    b1s = jnp.stack([u["conv2"]["b"] for u in units])
    a1s = jnp.stack([u["alpha1"] for u in units])
    a2s = jnp.stack([u["alpha2"] for u in units])
    return dk.res_stage_fused(x, w7s, b7s, w1s, b1s, a1s, a2s,
                              interpret=interp)


def encoder_forward(params: Dict, audio: jax.Array, cfg: DACConfig) -> jax.Array:
    """[B, T, 1] (T a multiple of hop) -> [B, T/hop, latent_dim]."""
    p = params["encoder"]
    x = conv1d(audio, p["conv_in"]["w"], p["conv_in"]["b"], padding=3)
    for i, stride in enumerate(cfg.encoder_rates):
        blk = p[f"block_{i}"]
        for j, dil in enumerate((1, 3, 9)):
            x = _res_unit(blk[f"res_{j}"], x, dil)
        x = snake(x, blk["alpha"])
        x = conv1d(x, blk["down"]["w"], blk["down"]["b"], stride=stride,
                   padding=math.ceil(stride / 2))
    x = snake(x, p["alpha_out"])
    x = conv1d(x, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)
    return x


def quantize(params: Dict, z_e: jax.Array, cfg: DACConfig,
             n_quantizers: Optional[int] = None):
    """Residual VQ over the encoder output.

    Args:
        z_e: [B, T, latent_dim] continuous encoder output.
    Returns:
        (z_q [B, T, latent_dim], codes [B, T, n_codebooks])
    """
    n = n_quantizers or cfg.n_codebooks
    z_q = jnp.zeros_like(z_e)
    residual = z_e
    codes = []
    for qi in range(n):
        p = params["quantizer"][f"vq_{qi}"]
        latents = conv1d(residual, p["in_proj"]["w"], p["in_proj"]["b"])
        # Cosine-similarity codebook search (equivalent to L2 on normalised
        # vectors): one [B*T, dim] x [dim, size] matmul on the MXU.
        enc_n = latents / (
            jnp.linalg.norm(latents, axis=-1, keepdims=True) + 1e-12
        )
        cb = p["codebook"]
        cb_n = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("btd,sd->bts", enc_n, cb_n,
                         preferred_element_type=jnp.float32)
        idx = jnp.argmax(sim, axis=-1)  # [B, T]
        z_q_i = cb[idx]  # [B, T, dim] — unnormalised embedding lookup
        z_q_i = conv1d(z_q_i, p["out_proj"]["w"], p["out_proj"]["b"])
        z_q = z_q + z_q_i
        residual = residual - z_q_i
        codes.append(idx)
    return z_q, jnp.stack(codes, axis=-1)


def decode_codes(params: Dict, codes: jax.Array, cfg: DACConfig) -> jax.Array:
    """[B, T, n_codebooks] int codes -> [B, T, latent_dim] quantised z."""
    z_q = None
    for qi in range(codes.shape[-1]):
        p = params["quantizer"][f"vq_{qi}"]
        z_q_i = p["codebook"][codes[..., qi]]
        z_q_i = conv1d(z_q_i, p["out_proj"]["w"], p["out_proj"]["b"])
        z_q = z_q_i if z_q is None else z_q + z_q_i
    return z_q


def decoder_forward(params: Dict, z: jax.Array, cfg: DACConfig,
                    fused_res_units: bool = False) -> jax.Array:
    """[B, T, latent_dim] -> [B, T*hop, 1] waveform in [-1, 1]."""
    p = params["decoder"]
    x = conv1d(z, p["conv_in"]["w"], p["conv_in"]["b"], padding=3)
    for i, stride in enumerate(cfg.decoder_rates):
        blk = p[f"block_{i}"]
        up = _snake_upsample(blk, x, stride) if fused_res_units and \
            x.dtype == jnp.float32 else None
        if up is not None:
            x = up
        else:
            x = snake(x, blk["alpha"])
            x = conv1d_transpose(
                x, blk["up"]["w"], blk["up"]["b"], stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2,
            )
        y = _res_stage(blk, x) \
            if fused_res_units and x.dtype == jnp.float32 else None
        if y is not None:
            x = y
        else:
            for j, dil in enumerate((1, 3, 9)):
                x = _res_unit(blk[f"res_{j}"], x, dil, fused=fused_res_units)
    x = snake(x, p["alpha_out"])
    x = conv1d(x, p["conv_out"]["w"], p["conv_out"]["b"], padding=3)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# User-facing wrapper
# ---------------------------------------------------------------------------


class DAC:
    """Frozen codec: jitted encode/decode over a parameter pytree.

    ``encode`` pads audio to a hop multiple (torch DAC's ``preprocess``) and
    returns the quantised continuous latent; ``decode`` synthesises audio.
    """

    def __init__(self, params: Dict, cfg: Optional[DACConfig] = None,
                 compute_dtype=None, fused_res_units: bool = False):
        """``compute_dtype=jnp.bfloat16`` runs the conv stacks in bf16
        (half the weight HBM, 2x MXU rate — a serving knob for the decode
        leg of the inference pipeline; parity vs fp32 is checked in
        tests/test_dac.py).  Weights are cast once here; snake's
        sin**2/alpha stays in the compute dtype (bounded, safe), the
        final tanh output is returned fp32."""
        self.cfg = cfg or DACConfig()
        self.params = params
        self.compute_dtype = compute_dtype
        # Serving knob (decode leg): fuse the C<=384 decoder tail's
        # residual units into one Pallas pass each (ops/dac_kernels.py,
        # 266.6 -> 220.1 ms per 32 s segment on a v5e).  OPT-IN because
        # the in-kernel single-pass bf16 tap dots are looser than XLA's
        # conv numerics (bit-parity tests and exact-seam guarantees hold
        # only on the default path); quality-gate before defaulting.
        self.fused_res_units = fused_res_units
        if fused_res_units and compute_dtype is not None and \
                jnp.dtype(compute_dtype) != jnp.float32:
            # The fused kernel gates on fp32 inputs (_res_unit), so this
            # combination silently falls back to the plain conv path —
            # and fp32 decode is FASTER on device anyway (PERF.md r3).
            import warnings

            warnings.warn(
                "fused_res_units requires fp32 decode; the "
                f"compute_dtype={jnp.dtype(compute_dtype).name} decoder "
                "will use the unfused conv path (drop compute_dtype to "
                "enable the fused kernel)", stacklevel=2)
        fru = fused_res_units
        c = self.cfg
        self._encode = jax.jit(
            lambda p, a: quantize(p, encoder_forward(p, a, c), c)
        )
        self._encode_continuous = jax.jit(
            lambda p, a: encoder_forward(p, a, c)
        )
        if compute_dtype is not None:
            # Decode-leg serving mode: decoder weights cast once; the
            # encode/quantize paths stay fp32 (bf16 codebook distances
            # could flip nearest-code decisions near ties).
            self._decode_params = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
                params["decoder"],
            )
            self._decode = jax.jit(
                lambda p, z: decoder_forward(
                    {"decoder": p}, z.astype(compute_dtype), c,
                    fused_res_units=fru,
                ).astype(jnp.float32)
            )
        else:
            self._decode_params = params["decoder"]
            self._decode = jax.jit(
                lambda p, z: decoder_forward({"decoder": p}, z, c,
                                             fused_res_units=fru))

    @classmethod
    def random_init(cls, seed: int = 0, cfg: Optional[DACConfig] = None,
                    compute_dtype=None, fused_res_units: bool = False):
        cfg = cfg or DACConfig()
        return cls(init_params(jax.random.PRNGKey(seed), cfg), cfg,
                   compute_dtype=compute_dtype,
                   fused_res_units=fused_res_units)

    def pad_audio(self, audio: jax.Array) -> jax.Array:
        t = audio.shape[1]
        pad = (-t) % self.cfg.hop_length
        if pad:
            audio = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))
        return audio

    def encode(self, audio: jax.Array, n_quantizers: Optional[int] = None):
        """[B, T, 1] -> (z [B, ceil(T/hop), latent], codes)."""
        z, codes = self._encode(self.params, self.pad_audio(audio))
        return z, codes

    def encode_continuous(self, audio: jax.Array) -> jax.Array:
        return self._encode_continuous(self.params, self.pad_audio(audio))

    def decode(self, z: jax.Array) -> jax.Array:
        """[B, T, latent] -> [B, T*hop, 1]."""
        return self._decode(self._decode_params, z)

    def decode_from_codes(self, codes: jax.Array) -> jax.Array:
        """[B, T, n_codebooks] int codes -> [B, T*hop, 1] (discrete-token
        storage path: ~18x smaller than the fp16 continuous latents)."""
        z = decode_codes(self.params, codes, self.cfg)
        return self._decode(self._decode_params, z)
