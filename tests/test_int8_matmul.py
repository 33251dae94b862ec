"""Pallas W8A8 int8 matmul: exactness vs the XLA integer path.

int8 x int8 -> int32 is exact arithmetic, so the Pallas kernel, the XLA
dot_general path, and a fp32 emulation must agree to fp32 rounding of the
identical rescale.  (Interpret mode does not enforce Mosaic tiling rules —
the real-chip smoke lives in tests/test_tpu_smoke.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.ops.int8_matmul import int8_matmul, quantize_cols, quantize_rows
from jatsr_tpu.ops.quant import int8_dot_general


@pytest.mark.parametrize("M,K,N", [(64, 128, 256), (100, 256, 128)])
def test_pallas_matches_xla_int8(M, K, N):
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rs.randn(K, N) * 0.05, jnp.bfloat16)
    a_q, a_s = quantize_rows(a)
    w_q, w_s = quantize_cols(w)

    got = int8_matmul(a_q, a_s, w_q, w_s, interpret=True,
                      block_m=32, block_n=128)
    ref = (
        jax.lax.dot_general(a_q, w_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        .astype(jnp.float32) * a_s * w_s
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert got.shape == (M, N)


@pytest.mark.parametrize("M,K,N", [(64, 128, 256), (100, 256, 128)])
def test_fused_matches_two_stage(M, K, N):
    """The fused (in-kernel activation quant) kernel computes exactly the
    two-stage result: same rounding, same int accumulate, same rescale."""
    from jatsr_tpu.ops.int8_matmul import int8_matmul_fused

    rs = np.random.RandomState(4)
    a = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rs.randn(K, N) * 0.05, jnp.bfloat16)
    a_q, a_s = quantize_rows(a)
    w_q, w_s = quantize_cols(w)
    want = int8_matmul(a_q, a_s, w_q, w_s, interpret=True,
                       block_m=32, block_n=128)
    got = int8_matmul_fused(a, w_q, w_s, interpret=True,
                            block_m=32, block_n=128)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_roundtrip_accuracy():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(50, 64), jnp.float32)
    x_q, s = quantize_rows(x)
    assert x_q.dtype == jnp.int8 and s.shape == (50, 1)
    back = x_q.astype(jnp.float32) * s
    # absmax symmetric quant: error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(back - x))) <= float(jnp.max(s)) * 0.5 + 1e-6


def test_int8_dot_general_dense_semantics():
    """Drop-in behaviour for nn.Dense: rank-3 lhs, [K, N] rhs, and a
    reasonable quantisation error vs the exact bf16 product."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 128), jnp.bfloat16)
    w = jnp.asarray(rs.randn(128, 256) * 0.05, jnp.bfloat16)
    got = int8_dot_general(x, w, (((2,), (0,)), ((), ())))
    assert got.shape == (2, 16, 256) and got.dtype == x.dtype
    ref = jnp.einsum("btk,kn->btn", x.astype(jnp.float32),
                     w.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err < 0.02 * scale


def test_int8_dot_general_fallback_general_contraction():
    """Non-Dense dimension numbers fall through to lax.dot_general."""
    rs = np.random.RandomState(3)
    a = jnp.asarray(rs.randn(4, 8, 16), jnp.float32)
    b = jnp.asarray(rs.randn(4, 16, 8), jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))  # batched
    got = int8_dot_general(a, b, dn)
    ref = jax.lax.dot_general(a, b, dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("N", [384, 1280])
def test_default_tiles_cover_all_output_columns(N):
    """Regression: auto-picked bn must divide N — a non-divisor makes the
    grid skip tail columns, leaving uninitialised output (NaN on chip)."""
    from jatsr_tpu.ops.int8_matmul import int8_matmul_fused

    rs = np.random.RandomState(5)
    a = jnp.asarray(rs.randn(64, 128), jnp.bfloat16)
    w = jnp.asarray(rs.randn(128, N) * 0.05, jnp.bfloat16)
    a_q, a_s = quantize_rows(a)
    w_q, w_s = quantize_cols(w)
    got_f = np.asarray(int8_matmul_fused(a, w_q, w_s, interpret=True))
    got_q = np.asarray(int8_matmul(a_q, a_s, w_q, w_s, interpret=True))
    ref = np.asarray((
        jax.lax.dot_general(a_q, w_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        .astype(jnp.float32) * a_s * w_s
    ).astype(jnp.bfloat16))
    np.testing.assert_array_equal(got_f, ref)
    np.testing.assert_array_equal(got_q, ref)
    assert not np.isnan(got_f.astype(np.float32)).any()


def test_static_quant_matches_dynamic_int8():
    """int8_static with quantize_params_static-converted weights produces
    EXACTLY the dynamic-int8 path's outputs (same symmetric absmax weight
    quantisation, same dynamic activation quantisation)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops.quant import quantize_params_static

    tiny = get_preset("tiny").model
    dyn_cfg = dataclasses.replace(tiny, matmul_precision="int8",
                                  quantize_head=True)
    sta_cfg = dataclasses.replace(tiny, matmul_precision="int8_static",
                                  quantize_head=True)
    key = jax.random.PRNGKey(0)
    B, T = 2, 128
    x = jax.random.normal(key, (B, T, tiny.input_channels))
    t = jnp.full((B,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, tiny.cond_channels))

    dyn = DiT(dyn_cfg)
    params = dyn.init({"params": key, "dropout": key}, x, t, c)["params"]
    # perturb the zero-init head so the head path is exercised
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    sta = DiT(sta_cfg)
    shapes = jax.eval_shape(
        lambda: sta.init({"params": key, "dropout": key}, x, t, c)["params"])
    qparams = quantize_params_static(params, shapes)

    o_dyn = dyn.apply({"params": params}, x, t, c)
    o_sta = sta.apply({"params": qparams}, x, t, c)
    assert jnp.array_equal(o_dyn, o_sta), (
        float(jnp.abs(o_dyn - o_sta).max()))


def test_fused_mlp_matches_unfused_static():
    """fused_mlp (Pallas dot+GELU+requant) matches the unfused int8_static
    MLP to bf16 tolerance (bf16 roundings are inserted at the same points;
    only GELU's internal precision differs)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    tiny = get_preset("tiny").model
    base = dataclasses.replace(tiny, matmul_precision="int8_static",
                               dropout=0.0, drop_path_rate=0.0)
    fused = dataclasses.replace(base, fused_mlp=True)
    key = jax.random.PRNGKey(0)
    B, T = 2, 128
    x = jax.random.normal(key, (B, T, tiny.input_channels))
    t = jnp.full((B,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, tiny.cond_channels))

    m0 = DiT(base)
    params = m0.init({"params": key, "dropout": key}, x, t, c)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    o0 = m0.apply({"params": params}, x, t, c)
    o1 = DiT(fused).apply({"params": params}, x, t, c)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=0.03, rtol=0.03)


def test_int8_mlp_full_kernel_close_to_half_path():
    """The whole-MLP kernel (int8_mlp) matches the two-stage fused path to
    quantisation tolerance.  Not bit-identical by design: g's int8 scales
    are per-(row, slab) instead of per-row — finer-grained, so the only
    differences come from re-quantisation granularity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.ops.int8_matmul import (
        int8_dense_gelu_quant,
        int8_mlp,
        quantize_cols,
    )

    rs = np.random.RandomState(0)
    M, H, N1 = 96, 128, 512
    a = jnp.asarray(rs.randn(M, H), jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(H, N1) * 0.05, jnp.float32)
    w2 = jnp.asarray(rs.randn(N1, H) * 0.05, jnp.float32)
    b1 = jnp.asarray(rs.randn(1, N1) * 0.1, jnp.float32)
    b2 = jnp.asarray(rs.randn(1, H) * 0.1, jnp.float32)
    w1q, w1s = quantize_cols(w1)
    w2q, w2s = quantize_cols(w2)

    full = int8_mlp(a, w1q, w1s, b1, w2q, w2s, b2, interpret=True)

    g_q, g_s = int8_dense_gelu_quant(a, w1q, w1s, b1, interpret=True)
    acc = jax.lax.dot_general(g_q, w2q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    half = (acc.astype(jnp.float32) * g_s * w2s + b2).astype(jnp.bfloat16)

    np.testing.assert_allclose(
        np.asarray(full, np.float32), np.asarray(half, np.float32),
        atol=0.05, rtol=0.05)
    # At one slab the only remaining difference is the reciprocal-multiply
    # quantisation (x * (1/s) vs x / s): at most one int8 ulp on round-to-
    # nearest ties, i.e. one quantisation step of either dot input.
    assert N1 <= 1280  # _pick_slabs returns 1 here
    close = np.isclose(np.asarray(full, np.float32),
                       np.asarray(half, np.float32), atol=0.02, rtol=0.02)
    assert close.mean() > 0.99, close.mean()


def test_fused_qkv_matches_separate():
    """fused_qkv (one merged q/k/v int8 dot) is bit-identical to the three
    separate projections: per-output-column weight scales and the shared
    per-row input scale make the merge exact.  Covers the
    quantize_params_static q/k/v concatenation too."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops.quant import quantize_params_static

    tiny = get_preset("tiny").model
    base = dataclasses.replace(tiny, matmul_precision="bf16",
                               dropout=0.0, drop_path_rate=0.0)
    key = jax.random.PRNGKey(0)
    B, T = 2, 64
    x = jax.random.normal(key, (B, T, tiny.input_channels))
    t = jnp.full((B,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, tiny.cond_channels))
    params = DiT(base).init({"params": key, "dropout": key}, x, t, c)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    outs = {}
    for fused in (False, True):
        scfg = dataclasses.replace(base, matmul_precision="int8_static",
                                   fused_qkv=fused)
        m = DiT(scfg)
        shapes = jax.eval_shape(
            lambda m=m: m.init({"params": key, "dropout": key},
                               x, t, c)["params"])
        qp = quantize_params_static(params, shapes)
        outs[fused] = m.apply({"params": qp}, x, t, c)
    assert jnp.array_equal(outs[False], outs[True]), (
        float(jnp.abs(outs[False] - outs[True]).max()))


def test_gelu_variants_key_the_jit_cache():
    """ADVICE r2 #1: gelu/epilogue used to be env vars read at trace time,
    so flipping them in-process silently reused the stale compiled kernel.
    As static args, each setting must get its own trace — same-shape calls
    with different settings must differ."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.ops.int8_matmul import int8_dense_gelu_quant, quantize_cols

    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(64, 128), jnp.bfloat16)
    # scale w so pre-GELU values land in [-3, 3], where tanh- and erf-GELU
    # differ most (~1e-3 relative)
    w_q, w_s = quantize_cols(
        jnp.asarray(rs.randn(128, 128) / np.sqrt(128), jnp.float32))
    b = jnp.zeros((1, 128), jnp.float32)

    q_tanh, s_tanh = int8_dense_gelu_quant(a, w_q, w_s, b, interpret=True,
                                           gelu_impl="tanh")
    q_erf, s_erf = int8_dense_gelu_quant(a, w_q, w_s, b, interpret=True,
                                         gelu_impl="erf")
    # tanh-GELU vs erf-GELU differ by ~1e-3 relative: the requantized int8
    # values cannot all be identical over 8k elements
    assert (np.asarray(q_tanh) != np.asarray(q_erf)).any() or not np.allclose(
        np.asarray(s_tanh), np.asarray(s_erf))

    q_fast, _ = int8_dense_gelu_quant(a, w_q, w_s, b, interpret=True,
                                      gelu_impl="tanh", fast_epilogue=True)
    q_exact, _ = int8_dense_gelu_quant(a, w_q, w_s, b, interpret=True,
                                       gelu_impl="tanh", fast_epilogue=False)
    # different epilogue precision -> different traces actually ran (bf16
    # round-trips shift some int8 rounds)
    assert q_fast.shape == q_exact.shape


def test_norm_mod_prologue_kernels_bit_match_unfused_chain():
    """int8_norm_mod_dot / int8_norm_mod_dense_gelu_quant fold the
    affine-free norm + AdaLN modulation + row quant into the dot kernels.
    Against an eager transcription of the unfused chain (flax norm -> bf16
    modulate -> w8a8_dot / int8_dense_gelu_quant) they are BIT-IDENTICAL:
    the prologue inserts bf16 rounds exactly where the unfused path has
    them, so the int8 quantisation boundaries cannot shift."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from jatsr_tpu.ops.int8_matmul import (
        int8_dense_gelu_quant,
        int8_norm_mod_dense_gelu_quant,
        int8_norm_mod_dot,
        quantize_cols,
    )
    from jatsr_tpu.ops.quant import w8a8_dot

    B, Np, H, N = 2, 16, 128, 256
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, Np, H)).astype(jnp.bfloat16)
    scale = (jax.random.normal(jax.random.PRNGKey(1), (B, H)) * 0.1
             ).astype(jnp.bfloat16)
    shift = (jax.random.normal(jax.random.PRNGKey(2), (B, H)) * 0.1
             ).astype(jnp.bfloat16)
    w_q, w_s = quantize_cols(
        jax.random.normal(jax.random.PRNGKey(3), (H, N)) / np.sqrt(H))
    b1 = (jax.random.normal(jax.random.PRNGKey(4), (1, N)) * 0.05
          ).astype(jnp.float32)

    for norm in ("layer", "rms"):
        m = (nn.RMSNorm(use_scale=False, epsilon=1e-6, dtype=jnp.bfloat16)
             if norm == "rms" else
             nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                          dtype=jnp.bfloat16))
        h = m.apply({}, x)
        h = h * (1 + scale[:, None, :]) + shift[:, None, :]

        ref = w8a8_dot(h.astype(jnp.bfloat16), w_q, w_s)
        got = int8_norm_mod_dot(
            x, scale.astype(jnp.float32), shift.astype(jnp.float32),
            w_q, w_s, jnp.zeros((1, N), jnp.float32),
            norm=norm, interpret=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

        rq, rs = int8_dense_gelu_quant(
            h.astype(jnp.bfloat16).reshape(B * Np, H), w_q, w_s, b1,
            interpret=True)
        gq, gs = int8_norm_mod_dense_gelu_quant(
            x, scale.astype(jnp.float32), shift.astype(jnp.float32),
            w_q, w_s, b1, norm=norm, interpret=True)
        np.testing.assert_array_equal(np.asarray(gq).reshape(B * Np, N),
                                      np.asarray(rq))
        np.testing.assert_array_equal(np.asarray(gs).reshape(B * Np, 1),
                                      np.asarray(rs))
