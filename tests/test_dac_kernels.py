"""Parity of the fused Pallas DAC residual-unit kernel vs the layer
composition it replaces (models/dac/model.py:_res_unit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_res_unit_fused_matches_composition(dilation):
    from jatsr_tpu.models.dac.layers import conv1d, snake
    from jatsr_tpu.ops.dac_kernels import res_unit_fused, res_unit_supported

    T, C = 3200, 128
    assert res_unit_supported(C, T, dilation)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w7 = jax.random.normal(ks[1], (7, C, C), jnp.float32) * 0.05
    b7 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (1, C, C), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    a1 = jnp.abs(jax.random.normal(ks[5], (C,), jnp.float32)) + 0.5
    a2 = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) + 0.5

    got = res_unit_fused(x, w7, b7, w1, b1, a1, a2,
                         dilation=dilation, interpret=True)

    xb = x[None]
    y = snake(xb, a1)
    y = conv1d(y, w7, b7, padding=3 * dilation, dilation=dilation)
    y = snake(y, a2)
    y = conv1d(y, w1, b1)
    want = (xb + y)[0]

    # The kernel's dots run bf16xbf16->fp32 (the same class as XLA's
    # DEFAULT-precision conv lowering); compare at bf16 resolution.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_res_unit_fused_snake_bf16_mode():
    """SNAKE_COMPUTE_DTYPE=bfloat16 (the r5 VPU half-width lever) must
    stay within loose tolerance of the fp32 composition — the argument
    rounding adds ~0.4% on top of the bf16 dot class."""
    from jatsr_tpu.models.dac.layers import conv1d, snake
    from jatsr_tpu.ops import dac_kernels as dk

    T, C, d = 1024, 128, 3
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w7 = jax.random.normal(ks[1], (7, C, C), jnp.float32) * 0.05
    b7 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (1, C, C), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    a1 = jnp.abs(jax.random.normal(ks[5], (C,), jnp.float32)) + 0.5
    a2 = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) + 0.5

    try:
        dk.set_snake_compute_dtype("bfloat16")
        jax.clear_caches()
        got = dk.res_unit_fused(x, w7, b7, w1, b1, a1, a2,
                                dilation=d, interpret=True)
    finally:
        dk.set_snake_compute_dtype("float32")
        jax.clear_caches()

    xb = x[None]
    y = snake(xb, a1)
    y = conv1d(y, w7, b7, padding=3 * d, dilation=d)
    y = snake(y, a2)
    y = conv1d(y, w1, b1)
    want = (xb + y)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1.5e-1, rtol=1.5e-1)


@pytest.mark.parametrize("dilation", [1, 9])
def test_res_unit_fused_c768(dilation):
    """C=768 kernel correctness (the r5 on-chip A/B measured it 8x slower
    than XLA's conv at stage-0 geometry, so production dispatch does NOT
    take it — res_unit_supported gates at C<=384 — but the kernel remains
    valid for other geometries)."""
    from jatsr_tpu.models.dac.layers import conv1d, snake
    from jatsr_tpu.ops.dac_kernels import res_unit_fused

    T, C = 256, 768
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w7 = jax.random.normal(ks[1], (7, C, C), jnp.float32) * 0.02
    b7 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (1, C, C), jnp.float32) * 0.02
    b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    a1 = jnp.abs(jax.random.normal(ks[5], (C,), jnp.float32)) + 0.5
    a2 = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) + 0.5

    got = res_unit_fused(x, w7, b7, w1, b1, a1, a2,
                         dilation=dilation, interpret=True)

    xb = x[None]
    y = snake(xb, a1)
    y = conv1d(y, w7, b7, padding=3 * dilation, dilation=dilation)
    y = snake(y, a2)
    y = conv1d(y, w1, b1)
    want = (xb + y)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=8e-2, rtol=8e-2)


def test_res_unit_fused_batched_matches_per_element():
    """[B, T, C] input through ONE pallas_call (grid carries the batch
    dim) must equal per-element kernel calls (ADVICE r3: no Python loop
    over B)."""
    from jatsr_tpu.ops.dac_kernels import res_unit_fused

    B, T, C, dil = 3, 3200, 128, 3
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w7 = jax.random.normal(ks[1], (7, C, C), jnp.float32) * 0.05
    b7 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (1, C, C), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    a1 = jnp.abs(jax.random.normal(ks[5], (C,), jnp.float32)) + 0.5
    a2 = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) + 0.5

    batched = res_unit_fused(x, w7, b7, w1, b1, a1, a2,
                             dilation=dil, interpret=True)
    assert batched.shape == (B, T, C)
    for i in range(B):
        single = res_unit_fused(x[i], w7, b7, w1, b1, a1, a2,
                                dilation=dil, interpret=True)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(single))


def test_res_stage_fused_matches_unit_composition():
    """One-kernel stage (3 chained units, dilations 1/3/9) must be
    bit-identical to composing res_unit_fused — including the sequence
    edges, where the recomputed halo must re-zero rows outside [0, T)
    between units (the previous unit's bias response is nonzero there)."""
    from jatsr_tpu.ops.dac_kernels import (res_stage_fused,
                                           res_stage_supported,
                                           res_unit_fused)

    C, T = 128, 4100  # non-multiple of the block size: tail path covered
    assert res_stage_supported(C, T)
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w7s = jax.random.normal(ks[1], (3, 7, C, C), jnp.float32) * 0.05
    b7s = jax.random.normal(ks[2], (3, C), jnp.float32) * 0.1
    w1s = jax.random.normal(ks[3], (3, C, C), jnp.float32) * 0.05
    b1s = jax.random.normal(ks[4], (3, C), jnp.float32) * 0.1
    a1s = jnp.abs(jax.random.normal(ks[5], (3, C))) + 0.5
    a2s = jnp.abs(jax.random.normal(ks[6], (3, C))) + 0.5

    got = res_stage_fused(x, w7s, b7s, w1s, b1s, a1s, a2s, interpret=True)
    want = x
    for u, d in enumerate((1, 3, 9)):
        want = res_unit_fused(want, w7s[u], b7s[u], w1s[u].reshape(1, C, C),
                              b1s[u], a1s[u], a2s[u], dilation=d,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_plus_bf16_decode_warns():
    """ADVICE r3: --fused-decode --bf16-decode silently fell back to the
    unfused path; the constructor must flag the interaction."""
    from jatsr_tpu.models.dac import DAC, DACConfig

    tiny = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                     decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                     codebook_dim=4)
    with pytest.warns(UserWarning, match="fp32"):
        DAC.random_init(0, cfg=tiny, compute_dtype=jnp.bfloat16,
                        fused_res_units=True)


def test_decoder_fused_path_matches_unfused(monkeypatch):
    """End-to-end decoder with fused res-units vs the plain path, on a
    sequence long enough to hit kernel eligibility in the tail stages.

    Off-TPU the model dispatch skips the Pallas kernels (interpret mode
    is far too slow for the now-default serving path) — force it here so
    this stays a real fused-vs-unfused comparison on CPU."""
    from jatsr_tpu.models.dac import DAC
    from jatsr_tpu.models.dac.model import decoder_forward
    from jatsr_tpu.ops import dac_kernels

    monkeypatch.setattr(dac_kernels, "ALLOW_INTERPRET_DISPATCH", True)
    codec = DAC.random_init(0)
    # 2 s at the production geometry: the last two stages (C=192/96)
    # clear the block-size eligibility threshold.
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 172, codec.cfg.latent_dim), jnp.float32)
    got = decoder_forward(codec.params, z, codec.cfg, fused_res_units=True)
    want = decoder_forward(codec.params, z, codec.cfg, fused_res_units=False)
    assert got.shape == want.shape
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 5e-2, err


def test_snake_conv_transpose_fused_matches_layers(monkeypatch):
    """Polyphase snake->conv_transpose kernel vs snake + conv1d_transpose
    at every decoder-stage geometry (Cin 192/384/768, strides 2/4/8).
    Block sizes are shrunk so interpret mode stays fast; the production
    sizes only change the grid, not the per-block math."""
    import math

    from jatsr_tpu.models.dac.layers import conv1d_transpose, snake
    from jatsr_tpu.ops import dac_kernels as dk

    monkeypatch.setattr(dk, "_TBLK_TR", {192: 64, 384: 64, 768: 64})
    for (ci, co, s, T) in [(192, 96, 2, 150), (384, 192, 4, 130),
                           (768, 384, 8, 65)]:
        k = 2 * s
        pad, op = math.ceil(s / 2), s % 2
        x = jax.random.normal(jax.random.PRNGKey(ci), (2, T, ci),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, ci, co),
                              jnp.float32) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
        a = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (ci,))) + 0.5
        assert dk.conv_transpose_supported(ci, co, s, k, T)
        got = dk.snake_conv_transpose_fused(
            x, w, b, a, stride=s, padding=pad, output_padding=op,
            interpret=True)
        want = conv1d_transpose(snake(x, a), w, b, stride=s, padding=pad,
                                output_padding=op)
        assert got.shape == want.shape
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        assert rel < 2e-2, (ci, rel)


def test_snake_conv_transpose_streamed_matches_layers(monkeypatch):
    """Phase-streamed polyphase transpose (stage-0 geometry: Cin too wide
    for resident weights) vs snake + conv1d_transpose.  Also covers a
    non-128-multiple Cout (channel padding) and the production
    1536 -> 768 stride-8 shape at a shrunk T/row block."""
    import math

    from jatsr_tpu.models.dac.layers import conv1d_transpose, snake
    from jatsr_tpu.ops import dac_kernels as dk

    monkeypatch.setattr(dk, "_TBLK_TR_STREAM", 32)
    for (ci, co, s, T) in [(1536, 768, 8, 40), (1024, 200, 4, 70)]:
        k = 2 * s
        pad, op = math.ceil(s / 2), s % 2
        x = jax.random.normal(jax.random.PRNGKey(ci), (2, T, ci),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, ci, co),
                              jnp.float32) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
        a = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (ci,))) + 0.5
        assert dk.conv_transpose_supported(ci, co, s, k, T)
        got = dk.snake_conv_transpose_fused(
            x, w, b, a, stride=s, padding=pad, output_padding=op,
            interpret=True)
        want = conv1d_transpose(snake(x, a), w, b, stride=s, padding=pad,
                                output_padding=op)
        assert got.shape == want.shape
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / float(jnp.max(jnp.abs(want)))
        assert rel < 2e-2, (ci, rel)
