"""Training flash-attention kernel (ops/attention_train.py) vs the XLA
einsum reference path — forward AND gradients, with and without dropout.

The dropout mask is a counter-based hash reproducible in pure jnp
(dropout_keep_mask), so even the dropout path has an EXACT reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.ops.attention_train import (
    dropout_keep_mask,
    gqa_attention_train,
)


def _reference(q, k, v, Hq, Hkv, rate=0.0, seed=0, np_=None):
    """Pure-jnp GQA with the SAME hash dropout mask as the kernel.
    q [B,N,Hq*D], k/v [B,N,Hkv*D]; all math in fp32."""
    B, N, QD = q.shape
    D = QD // Hq
    G = Hq // Hkv
    q4 = q.astype(jnp.float32).reshape(B, N, Hq, D)
    k4 = k.astype(jnp.float32).reshape(B, N, Hkv, D)
    v4 = v.astype(jnp.float32).reshape(B, N, Hkv, D)
    outs = []
    for h in range(Hq):
        kv = h // G
        s = jnp.einsum("bnd,bmd->bnm", q4[:, :, h], k4[:, :, kv])
        s = s / jnp.sqrt(jnp.float32(D))
        w = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            # kernel pads N to a sublane multiple; masks index the
            # PADDED lattice, valid region is the top-left N x N corner
            npad = np_ or N
            keep = jnp.stack([
                dropout_keep_mask(seed, b, h, npad, rate)[:N, :N]
                for b in range(B)
            ])
            w = jnp.where(keep, w / (1.0 - rate), 0.0)
        outs.append(jnp.einsum("bnm,bmd->bnd", w, v4[:, :, kv]))
    return jnp.stack(outs, axis=2).reshape(B, N, QD)


@pytest.mark.parametrize("N", [64, 90])
def test_forward_matches_reference_no_dropout(N):
    key = jax.random.PRNGKey(0)
    B, Hq, Hkv, D = 2, 4, 2, 32
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    got = gqa_attention_train(q, k, v, jnp.zeros(1, jnp.int32), Hq, Hkv,
                              dropout_rate=0.0, interpret=True)
    want = _reference(q, k, v, Hq, Hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_forward_matches_reference_with_dropout():
    key = jax.random.PRNGKey(1)
    B, N, Hq, Hkv, D = 2, 64, 4, 2, 32  # N multiple of 8: mask lattices align
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    seed = jnp.array([12345], jnp.int32)
    got = gqa_attention_train(q, k, v, seed, Hq, Hkv,
                              dropout_rate=0.25, interpret=True)
    want = _reference(q, k, v, Hq, Hkv, rate=0.25, seed=12345, np_=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # different seed -> different output (the stream actually varies)
    got2 = gqa_attention_train(q, k, v, seed + 1, Hq, Hkv,
                               dropout_rate=0.25, interpret=True)
    assert float(jnp.abs(got2 - got).max()) > 1e-3
    # same seed -> bit-identical (backward regenerates the same mask)
    got3 = gqa_attention_train(q, k, v, seed, Hq, Hkv,
                               dropout_rate=0.25, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got3))


def test_mask_keep_fraction():
    rate = 0.3
    keep = dropout_keep_mask(7, 1, 3, 256, rate)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.01


@pytest.mark.parametrize("rate,seed", [(0.0, 0), (0.25, 99)])
def test_gradients_match_reference(rate, seed):
    """Hand-written VJP vs jax.grad of the exact pure-jnp reference
    (identical mask by construction)."""
    key = jax.random.PRNGKey(2)
    B, N, Hq, Hkv, D = 2, 64, 4, 2, 16
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    r = jax.random.normal(ks[3], (B, N, Hq * D), jnp.float32)
    sd = jnp.array([seed], jnp.int32)

    def f_kernel(q, k, v):
        out = gqa_attention_train(q, k, v, sd, Hq, Hkv, dropout_rate=rate,
                                  interpret=True)
        return jnp.sum(out * r)

    def f_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, Hq, Hkv, rate=rate, seed=seed,
                                  np_=N) * r)

    g_got = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_gradients_with_sequence_padding():
    """N not a multiple of 8: the wrapper pads, the kernel masks padded
    keys, and pad/slice autodiff zeroes padded-row cotangents."""
    key = jax.random.PRNGKey(3)
    B, N, Hq, Hkv, D = 1, 45, 4, 2, 16
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    r = jax.random.normal(ks[3], (B, N, Hq * D), jnp.float32)

    def f_kernel(q, k, v):
        out = gqa_attention_train(q, k, v, jnp.zeros(1, jnp.int32), Hq,
                                  Hkv, dropout_rate=0.0, interpret=True)
        return jnp.sum(out * r)

    def f_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, Hq, Hkv) * r)

    np.testing.assert_allclose(float(f_kernel(q, k, v)),
                               float(f_ref(q, k, v)), rtol=1e-5)
    g_got = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    g_want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_got, g_want, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_finite_difference_with_dropout():
    """Directional finite difference through the REAL kernel with dropout
    on — proves forward and backward regenerate the identical mask."""
    key = jax.random.PRNGKey(4)
    B, N, Hq, Hkv, D = 1, 32, 2, 1, 16
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    r = jax.random.normal(ks[3], (B, N, Hq * D), jnp.float32)
    dq = jax.random.normal(ks[4], q.shape, jnp.float32)
    sd = jnp.array([7], jnp.int32)

    def f(q_):
        out = gqa_attention_train(q_, k, v, sd, Hq, Hkv, dropout_rate=0.2,
                                  interpret=True)
        return jnp.sum(out * r)

    g = jax.grad(f)(q)
    eps = 1e-3
    fd = (float(f(q + eps * dq)) - float(f(q - eps * dq))) / (2 * eps)
    an = float(jnp.sum(g * dq))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(an)), (fd, an)


def test_bf16_close_to_fp32():
    key = jax.random.PRNGKey(5)
    B, N, Hq, Hkv, D = 2, 64, 4, 2, 32
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, Hq * D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, Hkv * D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, Hkv * D), jnp.float32)
    got = gqa_attention_train(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), jnp.zeros(1, jnp.int32), Hq, Hkv,
        interpret=True)
    want = _reference(q, k, v, Hq, Hkv)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=3e-2)


def test_dit_grads_flash_train_vs_xla(monkeypatch):
    """Model-level: the flash training path (under nn.remat + nn.scan)
    produces gradients close to the XLA einsum path at dropout=0, and the
    dropout>0 path runs and is finite.

    Off-TPU the model dispatch falls back to the XLA einsum (interpret
    mode is too slow for real training now that flash is the default) —
    force the kernel path here so the comparison is real on CPU."""
    import dataclasses

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops import attention_train

    monkeypatch.setattr(attention_train, "ALLOW_INTERPRET_DISPATCH", True)

    base = dataclasses.replace(
        get_preset("tiny").model, dropout=0.0, drop_path_rate=0.0)
    B, T = 2, 64 * base.patch_len
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, base.input_channels))
    t = jnp.full((B,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, base.cond_channels))

    def loss(cfg, params):
        model = DiT(cfg)
        out = model.apply({"params": params}, x, t, c,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(out**2)

    cfg_x = dataclasses.replace(base, train_attention_impl="xla")
    cfg_f = dataclasses.replace(base, train_attention_impl="flash")
    params = DiT(cfg_x).init(
        {"params": key, "dropout": key}, x, t, c)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    (l_x, g_x) = jax.value_and_grad(lambda p: loss(cfg_x, p))(params)
    (l_f, g_f) = jax.value_and_grad(lambda p: loss(cfg_f, p))(params)
    # bf16 compute: the two paths round differently (fp32 VMEM softmax vs
    # fp32-scores einsum with bf16 weight cast) — loss agrees to ~1%.
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-2)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(g_f)}
    for kp, want in flat_x:
        got = flat_f[jax.tree_util.keystr(kp)]
        scale = max(float(jnp.abs(want).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(got, np.float32) / scale,
            np.asarray(want, np.float32) / scale,
            atol=3e-2, err_msg=jax.tree_util.keystr(kp))

    # dropout > 0: runs under remat+scan, finite loss and grads
    cfg_fd = dataclasses.replace(base, dropout=0.1,
                                 train_attention_impl="flash")
    l_fd, g_fd = jax.value_and_grad(lambda p: loss(cfg_fd, p))(params)
    assert np.isfinite(float(l_fd))
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(g_fd))
