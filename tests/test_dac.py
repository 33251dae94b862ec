"""DAC codec port tests.

The port must be numerically faithful to the published PyTorch DAC (the
latents feed the normalization stats everything downstream depends on —
SURVEY.md §7 "hard parts").  Since the pretrained weights aren't available
offline, parity is established against a torch *mirror* of the architecture
(weight-normalised convs + snake, identical wiring) built here in the test,
whose state_dict goes through the production converter."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from jatsr_tpu.models.dac import DAC, DACConfig, convert_torch_state_dict
from jatsr_tpu.models.dac.model import decode_codes, quantize, encoder_forward

torch.manual_seed(0)

SMALL = DACConfig(
    encoder_dim=16,
    encoder_rates=(2, 4),
    decoder_dim=32,
    decoder_rates=(4, 2),
    n_codebooks=2,
    codebook_size=32,
    codebook_dim=4,
)


# --- torch mirror of the DAC architecture (test fixture, random weights) ---

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


def _mirror_state_dict(model: TorchDAC, cfg: DACConfig):
    """Rename the mirror's keys to the published DAC naming scheme."""
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


@pytest.fixture(scope="module")
def pair():
    tmodel = TorchDAC(SMALL).eval()
    params = convert_torch_state_dict(_mirror_state_dict(tmodel, SMALL), SMALL)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tmodel, DAC(params, SMALL)


def test_encoder_parity(pair):
    tmodel, jmodel = pair
    audio = np.random.RandomState(0).randn(2, 1, 256).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tmodel.encoder(torch.from_numpy(audio)).numpy()
    got = np.asarray(
        jmodel.encode_continuous(jnp.asarray(audio.transpose(0, 2, 1)))
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_full_encode_decode_parity(pair):
    tmodel, jmodel = pair
    audio = np.random.RandomState(1).randn(2, 1, 256).astype(np.float32) * 0.3
    with torch.no_grad():
        z_e_t, z_q_t, codes_t = tmodel.encode_q(torch.from_numpy(audio))
        wav_t = tmodel.decoder(z_q_t).numpy()
    z_q_j, codes_j = jmodel.encode(jnp.asarray(audio.transpose(0, 2, 1)))
    np.testing.assert_array_equal(
        np.asarray(codes_j), codes_t.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(z_q_j).transpose(0, 2, 1), z_q_t.numpy(), atol=2e-4
    )
    wav_j = np.asarray(jmodel.decode(z_q_j)).transpose(0, 2, 1)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4)


def test_codes_roundtrip(pair):
    _, jmodel = pair
    audio = jnp.asarray(
        np.random.RandomState(2).randn(1, 300, 1).astype(np.float32) * 0.2
    )
    z_q, codes = jmodel.encode(audio)
    z_q2 = decode_codes(jmodel.params, codes, SMALL)
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(z_q2), atol=1e-5)


def test_hop_and_shapes_44k_config():
    cfg = DACConfig()
    assert cfg.hop_length == 512 and cfg.latent_dim == 1024
    codec = DAC.random_init(0, cfg)
    audio = jnp.zeros((1, 5120, 1))
    z, codes = codec.encode(audio)
    assert z.shape == (1, 10, 1024)
    assert codes.shape == (1, 10, 9)
    wav = codec.decode(z)
    assert wav.shape == (1, 5120, 1)


def test_nonmultiple_length_padding():
    codec = DAC.random_init(0, SMALL)  # hop = 8
    z, _ = codec.encode(jnp.zeros((1, 21, 1)))
    assert z.shape[1] == 3  # ceil(21/8)


def test_decode_from_codes(pair):
    _, jmodel = pair
    audio = jnp.asarray(
        np.random.RandomState(3).randn(1, 128, 1).astype(np.float32) * 0.2
    )
    z_q, codes = jmodel.encode(audio)
    a = np.asarray(jmodel.decode(z_q))
    b = np.asarray(jmodel.decode_from_codes(codes))
    np.testing.assert_allclose(a, b, atol=1e-5)
