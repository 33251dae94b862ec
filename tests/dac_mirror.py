"""Torch mirror of the published DAC architecture (test fixture).

An independent PyTorch implementation of descript's DAC (the codec the
reference loads via ``dac.utils.download`` + ``DAC.load``,
prepare_dataset_v5.py:107-110): weight-normalised convs, Snake activations,
residual VQ with L2-normalised codebook lookup.  Its ``state_dict`` —
renamed to the published key schema by ``mirror_state_dict`` — goes through
the production converter, so any padding/ordering/weight-norm divergence
between the JAX port and torch conv semantics fails the parity tests.

``numpy_weights`` fills every parameter from a ``numpy.RandomState`` recipe
(g=1-ish positive gains, unit-fan-in kernels, Snake alpha in [0.5, 1.5]) so
golden fixtures are reproducible independent of torch's RNG stream.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn

from jatsr_tpu.models.dac import DACConfig


def WNConv1d(*a, **kw):
    return nn.utils.weight_norm(nn.Conv1d(*a, **kw))


def WNConvTranspose1d(*a, **kw):
    return nn.utils.weight_norm(nn.ConvTranspose1d(*a, **kw))


class Snake1d(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.rand(1, c, 1) + 0.5)

    def forward(self, x):
        return x + (1.0 / (self.alpha + 1e-9)) * torch.sin(self.alpha * x) ** 2


class TResUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, 7, dilation=dilation, padding=pad),
            Snake1d(dim),
            WNConv1d(dim, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class TEncBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            TResUnit(dim // 2, 1), TResUnit(dim // 2, 3), TResUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class TDecBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(cin),
            WNConvTranspose1d(cin, cout, 2 * stride, stride=stride,
                              padding=math.ceil(stride / 2),
                              output_padding=stride % 2),
            TResUnit(cout, 1), TResUnit(cout, 3), TResUnit(cout, 9),
        )

    def forward(self, x):
        return self.block(x)


class TVQ(nn.Module):
    def __init__(self, input_dim, size, dim):
        super().__init__()
        self.in_proj = WNConv1d(input_dim, dim, 1)
        self.out_proj = WNConv1d(dim, input_dim, 1)
        self.codebook = nn.Embedding(size, dim)

    def forward(self, z):
        latents = self.in_proj(z)  # [B, D, T]
        enc = torch.nn.functional.normalize(latents.permute(0, 2, 1), dim=-1)
        cb = torch.nn.functional.normalize(self.codebook.weight, dim=-1)
        sim = enc @ cb.t()
        idx = sim.argmax(-1)  # [B, T]
        z_q = self.codebook(idx).permute(0, 2, 1)
        return self.out_proj(z_q), idx


class TorchDAC(nn.Module):
    def __init__(self, cfg: DACConfig):
        super().__init__()
        d = cfg.encoder_dim
        enc = [WNConv1d(1, d, 7, padding=3)]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(TEncBlock(d, s))
        enc += [Snake1d(d), WNConv1d(d, cfg.latent_dim, 3, padding=1)]
        self.encoder = nn.Sequential(*enc)

        self.quantizers = nn.ModuleList(
            TVQ(cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim)
            for _ in range(cfg.n_codebooks)
        )

        ch = cfg.decoder_dim
        dec = [WNConv1d(cfg.latent_dim, ch, 7, padding=3)]
        for i, s in enumerate(cfg.decoder_rates):
            dec.append(TDecBlock(ch // 2**i, ch // 2 ** (i + 1), s))
        last = ch // 2 ** len(cfg.decoder_rates)
        dec += [Snake1d(last), WNConv1d(last, 1, 7, padding=3), nn.Tanh()]
        self.decoder = nn.Sequential(*dec)

    def encode_q(self, audio):
        z_e = self.encoder(audio)
        z_q, residual, codes = 0, z_e, []
        for q in self.quantizers:
            z_q_i, idx = q(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(idx)
        return z_e, z_q, torch.stack(codes, -1)


def mirror_state_dict(model: TorchDAC):
    """Rename the mirror's keys to the published DAC naming scheme
    (``encoder.block.N``, ``decoder.model.N``, ``quantizer.quantizers.N``,
    weight-norm ``weight_g``/``weight_v`` pairs)."""
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        k2 = k
        if k.startswith("encoder."):
            k2 = "encoder.block." + k[len("encoder."):]
        elif k.startswith("decoder."):
            k2 = "decoder.model." + k[len("decoder."):]
        elif k.startswith("quantizers."):
            k2 = "quantizer.quantizers." + k[len("quantizers."):]
        out[k2] = v
    return out


@torch.no_grad()
def numpy_weights(model: TorchDAC, seed: int = 0) -> None:
    """Deterministically (re)initialise all parameters from numpy.

    Stability recipe for deep random codecs: weight-norm direction ``v`` ~
    N(0, 1/fan_in) with gain ``g`` in [0.7, 1.3] per output channel (folded
    kernels are then ~unit-row-norm, keeping activations O(1) through 4
    strided blocks), Snake ``alpha`` in [0.5, 1.5], biases ~ N(0, 0.01),
    codebooks ~ N(0, 1).  Iteration over sorted parameter names makes the
    stream independent of module registration order.
    """
    rs = np.random.RandomState(seed)
    for name, p in sorted(model.named_parameters(), key=lambda kv: kv[0]):
        shape = tuple(p.shape)
        if name.endswith("weight_g"):
            val = 0.7 + 0.6 * rs.rand(*shape)
        elif name.endswith("weight_v"):
            fan_in = int(np.prod(shape[1:]))
            val = rs.randn(*shape) / np.sqrt(max(fan_in, 1))
        elif name.endswith("alpha"):
            val = 0.5 + rs.rand(*shape)
        elif "codebook" in name:
            val = rs.randn(*shape)
        elif name.endswith("bias"):
            val = 0.01 * rs.randn(*shape)
        else:
            val = 0.02 * rs.randn(*shape)
        p.copy_(torch.from_numpy(val.astype(np.float32)))


def golden_audio(n_samples: int = 4096, seed: int = 7) -> np.ndarray:
    """Deterministic broadband test signal [1, 1, n] in (-0.5, 0.5)."""
    rs = np.random.RandomState(seed)
    t = np.arange(n_samples) / 44100.0
    sig = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + 0.15 * np.sin(2 * np.pi * 5000.0 * t)
        + 0.05 * rs.randn(n_samples)
    )
    return sig.astype(np.float32)[None, None, :]
