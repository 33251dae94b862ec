"""DiT shape/behaviour tests (mirrors the reference's test_model() self-tests
in src/models/jat_audiosr_v2.py:451-491 and the AdaLN-Zero init contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import ModelConfig, get_preset
from jatsr_tpu.models import DiT, count_params
from jatsr_tpu.models.dit import rope_cos_sin, sinusoidal_time_embedding

TINY = get_preset("tiny").model


def _init(cfg, B=2, T=24):
    model = DiT(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, cfg.input_channels))
    t = jax.random.uniform(key, (B,))
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.cond_channels))
    params = model.init({"params": key, "dropout": key}, x, t, c)["params"]
    return model, params, (x, t, c)


@pytest.mark.parametrize("T", [24, 26])  # divisible and non-divisible by patch_len
def test_forward_shapes(T):
    cfg = TINY
    model, params, _ = _init(cfg, B=2, T=24)
    x = jnp.ones((2, T, cfg.input_channels))
    t = jnp.full((2,), 0.5)
    c = jnp.ones((2, T, cfg.cond_channels))
    out = model.apply({"params": params}, x, t, c)
    assert out.shape == (2, T, cfg.input_channels)
    assert out.dtype == jnp.float32


def test_zero_init_output_is_zero():
    """AdaLN-Zero + zero final layer => output exactly 0 at init
    (ref jat_audiosr_v2.py:372-381)."""
    model, params, (x, t, c) = _init(TINY)
    out = model.apply({"params": params}, x, t, c)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_deterministic_eval_reproducible():
    model, params, (x, t, c) = _init(TINY)
    o1 = model.apply({"params": params}, x, t, c)
    o2 = model.apply({"params": params}, x, t, c)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dropout_path_runs():
    cfg = ModelConfig(**{**TINY.__dict__, "dropout": 0.1, "drop_path_rate": 0.1})
    model, params, (x, t, c) = _init(cfg)
    out = model.apply(
        {"params": params}, x, t, c, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert out.shape == x.shape


def test_param_counts_match_reference_formula():
    """Parameter totals for the reference configs
    (ref calculate_model_params.py:35-47, README.md:57-63)."""
    expected = {"v1": 60e6, "v2": 288e6, "v3": 766e6}
    for name, approx in expected.items():
        cfg = get_preset(name).model
        # count analytically without materialising the large params
        H, D_, P, C = cfg.hidden_size, cfg.depth, cfg.patch_len, cfg.input_channels
        kv = cfg.num_kv_heads * cfg.head_dim
        patch = (P * 2 * C) * cfg.bottleneck_dim + cfg.bottleneck_dim \
            + cfg.bottleneck_dim * H + H
        t_mlp = 2 * (H * H + H)
        attn = H * H + 2 * H * kv + H * H
        mlp = H * int(H * cfg.mlp_ratio) * 2 + int(H * cfg.mlp_ratio) + H
        adaln = H * 6 * H + 6 * H
        final = H * P * C + P * C
        total = patch + t_mlp + D_ * (attn + mlp + adaln) + final
        assert abs(total - approx) / approx < 0.08, (name, total)


def test_tiny_param_count_materialises():
    cfg = TINY
    _, params, _ = _init(cfg)
    n = count_params(params)
    assert 1e5 < n < 1e7


def test_rmsnorm_variant():
    cfg = ModelConfig(**{**TINY.__dict__, "norm": "rms"})
    model, params, (x, t, c) = _init(cfg)
    out = model.apply({"params": params}, x, t, c)
    assert out.shape == x.shape


def test_sinusoidal_embedding_matches_reference_formula():
    """Cross-check against a direct numpy transcription of
    jat_audiosr_v2.py:177-190."""
    dim, t = 64, np.array([0.0, 0.3, 1.0], dtype=np.float32)
    half = dim // 2
    emb_scale = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb_scale)
    args = t[:, None] * freqs[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    got = np.asarray(sinusoidal_time_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rope_tables_match_reference_formula():
    """Cross-check against jat_audiosr_v2.py:60-68."""
    dim, n = 16, 8
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
    tt = np.arange(n)
    freqs = np.outer(tt, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = rope_cos_sin(n, dim)
    np.testing.assert_allclose(np.asarray(cos), np.cos(emb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(emb), atol=1e-6)


def test_learned_pos_embed_v1_mode():
    """v1 legacy mode: learnable absolute positions, no RoPE
    (ref jat_audiosr.py:186-199)."""
    cfg = ModelConfig(**{**TINY.__dict__, "pos_embed": "learned"})
    model, params, (x, t, c) = _init(cfg)
    assert "pos_embed" in params
    assert params["pos_embed"].shape == (cfg.max_len, cfg.hidden_size)
    out = model.apply({"params": params}, x, t, c)
    assert out.shape == x.shape
    # positions actually matter: rolling the input changes the output once
    # params are perturbed away from zero-init
    import jax as _jax
    params2 = _jax.tree_util.tree_map(lambda p: p + 0.01, params)
    o1 = model.apply({"params": params2}, x, t, c)
    o2 = model.apply({"params": params2}, jnp.roll(x, 4, axis=1), t, c)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_v1legacy_mha_bias_mode():
    """v1-legacy parity: MHA (Q==KV heads) with biased projections and
    learned positions (ref src/models/jat_audiosr.py:95, 138-222)."""
    from jatsr_tpu.configs import get_preset

    preset = get_preset("v1legacy").model
    assert preset.num_q_heads == preset.num_kv_heads == 12
    assert preset.attention_bias and preset.pos_embed == "learned"
    assert preset.hidden_size == 768 and preset.bottleneck_dim == 128

    cfg = ModelConfig(**{**TINY.__dict__, "attention_bias": True,
                         "pos_embed": "learned",
                         "num_kv_heads": TINY.num_q_heads})
    model, params, (x, t, c) = _init(cfg)
    attn = params["blocks"]["attn"]
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        assert "bias" in attn[proj], proj  # MHA projections carry biases
    out = model.apply({"params": params}, x, t, c)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_scores_close_to_fp32():
    """scores_dtype="bfloat16" stores the shifted logits in bf16; the
    softmax weights move by < 1% so outputs stay close to the fp32 path."""
    cfg32 = ModelConfig(**{**TINY.__dict__, "scores_dtype": "float32"})
    cfg16 = ModelConfig(**{**TINY.__dict__, "scores_dtype": "bfloat16"})
    model32, params, (x, t, c) = _init(cfg32)
    # perturb away from the zero-init head so outputs are non-trivial
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    o32 = model32.apply({"params": params}, x, t, c)
    o16 = DiT(cfg16).apply({"params": params}, x, t, c)
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               atol=0.02, rtol=0.02)
    assert not np.array_equal(np.asarray(o16), np.asarray(o32))


def test_adaln_tables_match_inline_path():
    """The hoisted-AdaLN serving path (models.dit.adaln_tables + DiT's
    adaln_mod argument) matches the per-block inline adaln computation to
    bf16 tolerance (the table einsum contracts the same weights in one
    stacked dot)."""
    import dataclasses

    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.models.dit import adaln_tables

    cfg = dataclasses.replace(get_preset("tiny").model, dropout=0.0,
                              drop_path_rate=0.0)
    model = DiT(cfg)
    key = jax.random.PRNGKey(0)
    B, T = 2, 64
    x = jax.random.normal(key, (B, T, cfg.input_channels))
    t = jnp.full((B,), 0.37)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.cond_channels))
    params = model.init({"params": key, "dropout": key}, x, t, c)["params"]
    # zero-init adaln would make the tables trivially equal — perturb
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    o_inline = model.apply({"params": params}, x, t, c)
    mod = adaln_tables(cfg, params, t[:1])  # [depth, 1, 6H], broadcast on B
    o_tables = model.apply({"params": params}, x, t, c, adaln_mod=mod)
    np.testing.assert_allclose(np.asarray(o_tables), np.asarray(o_inline),
                               atol=2e-2, rtol=2e-2)


def test_flash_vmem_guard_falls_back():
    """Sequences whose whole-sequence flash tile would blow VMEM must fall
    back to the XLA einsum instead of failing Mosaic compilation
    (ADVICE r2 #3): the two configs produce identical outputs because the
    kernel never runs at this N."""
    import dataclasses

    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops.attention import flash_supported

    assert flash_supported(345, 20, 4, 64)      # production geometry
    assert not flash_supported(1378, 20, 4, 64)  # whole-chunk N: too big

    base = dataclasses.replace(
        get_preset("tiny").model, dropout=0.0, drop_path_rate=0.0,
        matmul_precision="int8_static", fused_qkv=True, fused_mlp=False,
    )
    # tiny geometry (Hq=4, Hkv=2, D=32): guard trips past N ~ 1000
    N = 1024
    assert not flash_supported(N, base.num_q_heads, base.num_kv_heads,
                               base.head_dim)
    key = jax.random.PRNGKey(0)
    B, T = 1, N * base.patch_len
    x = jax.random.normal(key, (B, T, base.input_channels))
    t = jnp.full((B,), 0.5)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, base.cond_channels))
    flash = DiT(dataclasses.replace(base, attention_impl="flash"))
    params = flash.init({"params": key, "dropout": key}, x, t, c)["params"]
    o_flash = flash.apply({"params": params}, x, t, c)
    assert np.isfinite(np.asarray(o_flash)).all()
    xla = DiT(dataclasses.replace(base, attention_impl="xla"))
    o_xla = xla.apply({"params": params}, x, t, c)
    np.testing.assert_array_equal(np.asarray(o_flash), np.asarray(o_xla))


def test_sublane_aligned_serving_matches_unaligned():
    """The flash serving path pads N to a sublane multiple (345 -> 352
    style) with padded positions masked as attention keys and trimmed from
    the output — results must match the unpadded computation."""
    import dataclasses

    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    cfg = dataclasses.replace(
        get_preset("tiny").model, dropout=0.0, drop_path_rate=0.0,
        matmul_precision="int8_static", fused_mlp=False, fused_qkv=True,
        attention_impl="flash", align_n=True,
    )
    model = DiT(cfg)
    key = jax.random.PRNGKey(0)
    B, T = 2, 92 * cfg.patch_len  # N=92: not a multiple of 8 -> pads to 96
    x = jax.random.normal(key, (B, T, cfg.input_channels))
    t = jnp.full((B,), 0.4)
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.cond_channels))
    params = model.init({"params": key, "dropout": key}, x, t, c)["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

    o_aligned = model.apply({"params": params}, x, t, c)
    assert o_aligned.shape == (B, T, cfg.input_channels)
    # the split-path flash (v3, flash_qkv=False) computes the same
    # attention without the alignment pre-padding
    plain = DiT(dataclasses.replace(cfg, align_n=False, flash_qkv=False))
    o_plain = plain.apply({"params": params}, x, t, c)
    np.testing.assert_allclose(np.asarray(o_aligned), np.asarray(o_plain),
                               atol=2e-2, rtol=2e-2)


def test_fused_prologue_matches_unfused_serving():
    """fused_prologue folds norm+modulate+quant into the qkv/mlp_in dot
    kernels — outputs must match the standard int8_static serving path on
    the same params (fp32 prologue vs bf16 intermediates: small tolerance)."""
    import dataclasses

    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    base = dataclasses.replace(
        get_preset("tiny").model, dropout=0.0, drop_path_rate=0.0,
        matmul_precision="int8_static", fused_qkv=True, fused_mlp=True,
        attention_impl="flash", align_n=True,
    )
    for norm in ("layer", "rms"):
        cfg = dataclasses.replace(base, norm=norm)
        model = DiT(cfg)
        key = jax.random.PRNGKey(0)
        B, T = 2, 92 * cfg.patch_len  # N=92 -> align pads to 96 (8-aligned)
        x = jax.random.normal(key, (B, T, cfg.input_channels))
        t = jnp.full((B,), 0.4)
        c = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.cond_channels))
        params = model.init({"params": key, "dropout": key}, x, t, c)["params"]
        params = jax.tree_util.tree_map(lambda p: p + 0.01, params)

        o_std = model.apply({"params": params}, x, t, c)
        fused = DiT(dataclasses.replace(cfg, fused_prologue=True))
        o_pro = fused.apply({"params": params}, x, t, c)
        assert o_pro.shape == o_std.shape
        # The prologue kernel is bit-identical to an eager transcription
        # of the unfused chain (unit tests in test_int8_matmul.py), but
        # the XLA path itself is compilation-context-sensitive: when
        # fusing the norm/mod elementwise chain XLA may keep fp32 through
        # intermediates instead of rounding each bf16 op, so the model's
        # own std-path numerics wobble at the bf16 level and amplify
        # through the affine-free norms.  Tolerance covers that wobble.
        np.testing.assert_allclose(np.asarray(o_pro), np.asarray(o_std),
                                   atol=8e-2, rtol=8e-2)


def test_unrolled_blocks_bit_identical_to_scan():
    """ModelConfig.unroll_blocks (serving knob: nn.scan unroll=depth —
    turns per-layer weight dynamic-slice copies into static views) must
    produce BIT-identical outputs from the SAME stacked params."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    base = dataclasses.replace(get_preset("tiny").model, dropout=0.0,
                               drop_path_rate=0.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 130, base.input_channels))
    t = jnp.full((2,), 0.3)
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 130, base.cond_channels))
    scan = DiT(base)
    unrolled = DiT(dataclasses.replace(base, unroll_blocks=True))
    params = scan.init({"params": key, "dropout": key}, x, t, c)["params"]
    o1 = scan.apply({"params": params}, x, t, c)
    o2 = unrolled.apply({"params": params}, x, t, c)
    assert float(jnp.max(jnp.abs(o1 - o2))) == 0.0


@pytest.mark.parametrize("policy", ["none", "attn_out", "dots"])
def test_remat_policies_grads_match_full(policy):
    """Rematerialisation trades memory for recompute — it must never
    change values: loss and grads under every policy (incl. the selective
    "attn_out" saved-landmark policy) equal the "full" baseline."""
    import dataclasses

    def loss_for(p):
        cfg = dataclasses.replace(TINY, remat_policy=p)
        model, params, (x, t, c) = _init(cfg)

        def loss(pp):
            out = model.apply({"params": pp}, x, t, c,
                              deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(5)})
            return jnp.mean(out * out) + jnp.mean(
                jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b * b), pp, 0.0))

        return jax.value_and_grad(loss)(params)

    l_ref, g_ref = loss_for("full")
    l_got, g_got = loss_for(policy)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
