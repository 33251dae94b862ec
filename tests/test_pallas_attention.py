"""Pallas fused GQA kernel vs the XLA einsum reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import get_preset
from jatsr_tpu.models import DiT
from jatsr_tpu.ops.attention import gqa_attention


def _reference_gqa(q, k, v):
    B, N, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, N, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("bnkgd,bmkd->bkgnm", qg, k.astype(jnp.float32))
    s = s / np.sqrt(D)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgnm,bmkd->bnkgd", w, v.astype(jnp.float32))
    return o.reshape(B, N, Hq, D)


@pytest.mark.parametrize("N", [128, 345])  # aligned + production (padded)
def test_kernel_matches_einsum(N):
    rs = np.random.RandomState(0)
    B, Hq, Hkv, D = 2, 4, 2, 64
    q = jnp.asarray(rs.randn(B, N, Hq, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, Hkv, D), jnp.float32)
    got = np.asarray(gqa_attention(q, k, v, interpret=True))
    want = np.asarray(_reference_gqa(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_model_pallas_impl_matches_xla():
    base = get_preset("tiny").model
    # head_dim must be >= 1 lane-friendly; tiny: 128/4 = 32
    cfg_x = dataclasses.replace(base, attention_impl="xla", dropout=0.0)
    cfg_p = dataclasses.replace(base, attention_impl="pallas", dropout=0.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 36, base.input_channels))
    t = jnp.full((2,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 36, base.cond_channels))
    params = DiT(cfg_x).init({"params": key, "dropout": key}, x, t, c)["params"]
    # perturb final layer so outputs are non-zero
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jnp.ones_like(p), params
    )
    out_x = DiT(cfg_x).apply({"params": params}, x, t, c)
    out_p = DiT(cfg_p).apply({"params": params}, x, t, c)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), atol=3e-2, rtol=3e-2
    )


def test_training_path_ignores_pallas():
    """Non-deterministic (training) calls use the XLA path even with
    attention_impl=pallas — gradients must flow."""
    cfg = dataclasses.replace(get_preset("tiny").model,
                              attention_impl="pallas")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, cfg.input_channels))
    t = jnp.full((1,), 0.3)
    model = DiT(cfg)
    params = model.init({"params": key, "dropout": key}, x, t, x)["params"]

    def loss(p):
        out = model.apply({"params": p}, x, t, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        return (out**2).mean()

    g = jax.grad(loss)(params)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(lambda v: (v.astype(jnp.float32)**2).sum(), g),
        ))
    )


def test_int8_matmul_close_to_bf16():
    """int8 dynamic W8A8 serving mode stays close to the bf16 path."""
    import dataclasses
    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    import jax, jax.numpy as jnp, numpy as np

    base = get_preset("tiny").model
    cfg_b = dataclasses.replace(base, dropout=0.0)
    cfg_q = dataclasses.replace(base, dropout=0.0, matmul_precision="int8")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 36, base.input_channels))
    t = jnp.full((2,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 36, base.cond_channels))
    params = DiT(cfg_b).init({"params": key, "dropout": key}, x, t, c)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)
    out_b = np.asarray(DiT(cfg_b).apply({"params": params}, x, t, c))
    out_q = np.asarray(DiT(cfg_q).apply({"params": params}, x, t, c))
    # relative error of the quantized path vs bf16, on the output scale
    denom = np.abs(out_b).mean() + 1e-6
    rel = np.abs(out_q - out_b).mean() / denom
    assert rel < 0.1, rel


def test_int8_dot_general_unit():
    import jax, jax.numpy as jnp, numpy as np
    from jatsr_tpu.ops.quant import int8_dot_general

    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.randn(5, 7, 64), jnp.bfloat16)
    w = jnp.asarray(rs.randn(64, 32), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    got = np.asarray(int8_dot_general(a, w, dn)).astype(np.float32)
    want = np.asarray(jax.lax.dot_general(a.astype(jnp.float32), w, dn))
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-6)
    assert err < 0.02, err
    assert got.shape == want.shape


def test_grouped_kernel_matches_einsum():
    """pallas2 (per-(batch, kv-head) programs) parity with the XLA einsum."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.ops.attention import gqa_attention_grouped

    key = jax.random.PRNGKey(3)
    B, N, Hq, Hkv, D = 2, 90, 8, 2, 32  # N deliberately not lane-aligned
    G = Hq // Hkv
    q = jax.random.normal(key, (B, N, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, N, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, N, Hkv, D), jnp.float32)

    got = gqa_attention_grouped(q, k, v, interpret=True)

    qg = q.reshape(B, N, Hkv, G, D)
    s = jnp.einsum("bnkgd,bmkd->bkgnm", qg, k) / math.sqrt(D)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bkgnm,bmkd->bnkgd", w, v).reshape(B, N, Hq, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_kernel_matches_einsum():
    """flash (per-batch programs, flat head layout, in-kernel head loop)
    parity with the XLA einsum path."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.ops.attention import gqa_attention_flash

    key = jax.random.PRNGKey(6)
    B, N, Hq, Hkv, D = 2, 90, 8, 2, 32  # N deliberately not sublane-aligned
    G = Hq // Hkv
    q = jax.random.normal(key, (B, N, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(7), (B, N, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, N, Hkv, D), jnp.float32)

    got = gqa_attention_flash(
        q.reshape(B, N, Hq * D), k.reshape(B, N, Hkv * D),
        v.reshape(B, N, Hkv * D), Hq, Hkv, interpret=True,
    ).reshape(B, N, Hq, D)

    qg = q.reshape(B, N, Hkv, G, D)
    s = jnp.einsum("bnkgd,bmkd->bkgnm", qg, k) / math.sqrt(D)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bkgnm,bmkd->bnkgd", w, v).reshape(B, N, Hq, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_qkv_kernel_matches_split_path():
    """flash v3.1 (unsplit QKV + in-kernel RoPE) parity with splitting +
    apply_rope + the flash v3 kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.models.dit import apply_rope, rope_cos_sin
    from jatsr_tpu.ops.attention import (
        gqa_attention_flash,
        gqa_attention_flash_qkv,
    )

    key = jax.random.PRNGKey(9)
    B, N, Hq, Hkv, D = 2, 90, 8, 2, 32
    qkv = jax.random.normal(key, (B, N, (Hq + 2 * Hkv) * D), jnp.float32)
    cos, sin = rope_cos_sin(N, D)

    got = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv, interpret=True)

    q = qkv[..., : Hq * D].reshape(B, N, Hq, D)
    k = qkv[..., Hq * D: (Hq + Hkv) * D].reshape(B, N, Hkv, D)
    v = qkv[..., (Hq + Hkv) * D:]
    q = apply_rope(q, cos, sin).reshape(B, N, Hq * D)
    k = apply_rope(k, cos, sin).reshape(B, N, Hkv * D)
    want = gqa_attention_flash(q, k, v, Hq, Hkv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # bf16 softmax weights (the scores_dtype=bfloat16 serving mode): close
    # to the fp32-weight path within bf16 resolution, not bit-equal.
    got_bf16 = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv,
                                       interpret=True, bf16_weights=True)
    np.testing.assert_allclose(np.asarray(got_bf16), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_flash_qkv_pipeline_v_exact():
    """flash v3.5 (value dot deferred one head iteration, VERDICT r4 #1)
    is a pure reordering: per-head arithmetic is identical, so the output
    must be BIT-EQUAL to the v3.1 kernel — odd and even head counts cover
    both tails of the paired-store logic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.models.dit import rope_cos_sin
    from jatsr_tpu.ops.attention import gqa_attention_flash_qkv

    for Hq, Hkv in ((8, 2), (5, 1)):
        B, N, D = 2, 90, 32
        key = jax.random.PRNGKey(11 + Hq)
        qkv = jax.random.normal(key, (B, N, (Hq + 2 * Hkv) * D), jnp.float32)
        cos, sin = rope_cos_sin(N, D)
        want = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv,
                                       interpret=True)
        got = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv,
                                      interpret=True, pipeline_v=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # and with the int8 value-dot variant (v3.4 + v3.5 compose)
        want8 = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv,
                                        interpret=True, int8_qk=True)
        got8 = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv,
                                       interpret=True, int8_qk=True,
                                       pipeline_v=True)
        np.testing.assert_array_equal(np.asarray(got8), np.asarray(want8))


def test_flash_qkv_bf16_inputs_close_to_fp32():
    """ADVICE r3: the base-2 rewrite folds scale*log2(e) into q in the
    INPUT dtype, so on the bf16 serving path the scale multiply rounds in
    bf16 (one extra round per q element vs the old fp32 post-dot scale).
    Bound that drift: bf16 qkv through the kernel must stay within bf16
    resolution of the fp32 einsum reference."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.models.dit import apply_rope, rope_cos_sin
    from jatsr_tpu.ops.attention import gqa_attention_flash_qkv

    key = jax.random.PRNGKey(21)
    B, N, Hq, Hkv, D = 2, 90, 8, 2, 32
    G = Hq // Hkv
    qkv32 = jax.random.normal(key, (B, N, (Hq + 2 * Hkv) * D), jnp.float32)
    qkv16 = qkv32.astype(jnp.bfloat16)
    cos, sin = rope_cos_sin(N, D)

    got = gqa_attention_flash_qkv(qkv16, cos, sin, Hq, Hkv, interpret=True)

    # fp32 reference: split, rope, classic scaled softmax (no base-2 fold),
    # from the SAME bf16-rounded inputs so the comparison isolates the
    # kernel's own rounding (q-scale fold + bf16 dots).
    qkv = qkv16.astype(jnp.float32)
    q = qkv[..., : Hq * D].reshape(B, N, Hq, D)
    k = qkv[..., Hq * D: (Hq + Hkv) * D].reshape(B, N, Hkv, D)
    v = qkv[..., (Hq + Hkv) * D:].reshape(B, N, Hkv, D)
    q = apply_rope(q, cos, sin).reshape(B, N, Hkv, G, D)
    k = apply_rope(k, cos, sin)
    s = jnp.einsum("bnkgd,bmkd->bkgnm", q, k) / math.sqrt(D)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bkgnm,bmkd->bnkgd", w, v).reshape(B, N, Hq * D)

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=2e-2, rtol=2e-2)


def test_flash_out_kernel_matches_unfused_out_proj():
    """flash v3.2 (fused int8 out-projection) parity with v3.1 + the
    unfused dynamic per-row quantised out-proj dot."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.models.dit import rope_cos_sin
    from jatsr_tpu.ops.attention import (
        gqa_attention_flash_out,
        gqa_attention_flash_qkv,
    )
    from jatsr_tpu.ops.int8_matmul import quantize_cols, quantize_rows

    key = jax.random.PRNGKey(10)
    B, N, Hq, Hkv, D, H = 2, 90, 8, 2, 32, 128
    qkv = jax.random.normal(key, (B, N, (Hq + 2 * Hkv) * D), jnp.float32)
    cos, sin = rope_cos_sin(N, D)
    wo = jax.random.normal(jax.random.PRNGKey(11), (Hq * D, H)) * 0.05
    bo = jax.random.normal(jax.random.PRNGKey(12), (1, H)) * 0.1
    wo_q, wo_s = quantize_cols(wo)

    got = gqa_attention_flash_out(qkv, cos, sin, wo_q, wo_s, bo,
                                  Hq, Hkv, interpret=True)

    o = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv, interpret=True)
    o_q, o_s = quantize_rows(o.reshape(B * N, Hq * D))
    acc = jax.lax.dot_general(o_q, wo_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    want = (acc.astype(jnp.float32) * o_s * wo_s + bo).reshape(B, N, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_flash_qkv_production_head_geometry():
    """flash v3.1 at the real v3 head geometry (20 Q / 4 KV heads, D=64):
    the in-kernel head-column slicing and KV-group indexing must hold at
    the shipped shape, not just the small test geometry."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.models.dit import apply_rope, rope_cos_sin
    from jatsr_tpu.ops.attention import gqa_attention_flash_qkv

    B, N, Hq, Hkv, D = 1, 61, 20, 4, 64  # N odd: exercises the pad path
    G = Hq // Hkv
    qkv = jax.random.normal(jax.random.PRNGKey(13),
                            (B, N, (Hq + 2 * Hkv) * D), jnp.float32)
    cos, sin = rope_cos_sin(N, D)
    got = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv, interpret=True)

    q = apply_rope(qkv[..., : Hq * D].reshape(B, N, Hq, D), cos, sin)
    k = apply_rope(
        qkv[..., Hq * D: (Hq + Hkv) * D].reshape(B, N, Hkv, D), cos, sin)
    v = qkv[..., (Hq + Hkv) * D:].reshape(B, N, Hkv, D)
    qg = q.reshape(B, N, Hkv, G, D)
    s = jnp.einsum("bnkgd,bmkd->bkgnm", qg, k) / math.sqrt(D)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bkgnm,bmkd->bnkgd", w, v).reshape(B, N, Hq * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_flash_int8_qk_close_to_bf16():
    """Hybrid v3.4 (bf16 scores + int8 value dot) approximates the bf16
    kernel: fixed-127-scale softmax-weight quantisation and per-column v
    quantisation bound the output error at ~1% relative."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.ops.attention import gqa_attention_flash_qkv
    from jatsr_tpu.models.dit import rope_cos_sin

    B, N, Hq, Hkv, D = 2, 48, 4, 2, 32
    TD = (Hq + 2 * Hkv) * D
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (B, N, TD))
           ).astype(jnp.bfloat16)
    cos, sin = rope_cos_sin(N, D)
    ref = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv, interpret=True)
    got = gqa_attention_flash_qkv(qkv, cos, sin, Hq, Hkv, interpret=True,
                                  int8_qk=True)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel
    assert np.isfinite(got).all()
