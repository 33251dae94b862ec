"""Train-step tests: overfit gate (the reference's canonical correctness
check, tests/test_dac_overfit_v2.py:210-305) in latent space, plus SPMD
data/tensor-parallel execution on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import get_preset
from jatsr_tpu.models import DiT
from jatsr_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from jatsr_tpu.train import create_train_state, make_eval_step, make_train_step
from jatsr_tpu.train.step import Normalizer

PRESET = get_preset("tiny")
B, T, C = 4, 24, 1024


def _setup(train_overrides=None, loss_cfg=None):
    rs = np.random.RandomState(0)
    hr = jnp.asarray(rs.randn(B, T, C), jnp.float32)
    lr = jnp.asarray(rs.randn(B, T, C), jnp.float32)
    tcfg = PRESET.train
    if train_overrides:
        tcfg = dataclasses.replace(tcfg, **train_overrides)
    lcfg = loss_cfg or PRESET.loss
    model = DiT(PRESET.model)
    state = create_train_state(model, tcfg, total_steps=1000,
                               sample_batch=(hr, lr))
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    step = make_train_step(lcfg, tcfg, norm)
    return state, step, (hr, lr), lcfg, norm


def test_train_step_runs_and_updates():
    state, step, (hr, lr), *_ = _setup()
    jstep = jax.jit(step, donate_argnums=(0,))
    new_state, metrics = jstep(state, hr, lr)
    assert int(new_state.step) == 1
    for k in ["loss", "recon_loss", "grad_norm", "snr_db", "pred_mean",
              "pred_std", "cond_noise_std"]:
        assert np.isfinite(float(metrics[k])), k


def test_loss_decreases_overfit():
    """Mini overfit gate: a few hundred steps on one batch must slash the
    flow-matching loss (full-scale version of the reference's 1000-epoch
    single-clip gate)."""
    state, step, (hr, lr), *_ = _setup(
        {"condition_noise_ratio": 0.0, "lr": 3e-4, "warmup_steps": 20}
    )
    jstep = jax.jit(step, donate_argnums=(0,))
    first = None
    for i in range(150):
        state, metrics = jstep(state, hr, lr)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < 0.5 * first, (first, last)


def test_latent_perceptual_metrics_present():
    state, step, (hr, lr), *_ = _setup(
        loss_cfg=dataclasses.replace(PRESET.loss, use_latent_perceptual=True)
    )
    _, metrics = jax.jit(step)(state, hr, lr)
    for k in ["freq_loss", "ms_loss", "consistency_loss", "total_latent_loss"]:
        assert np.isfinite(float(metrics[k])), k


def test_cfg_dropout_zeroes_condition_statistically():
    """With cfg_dropout_prob=1.0 every condition is nulled; the model then
    cannot use LR at all -> changing LR must not change the loss."""
    state, step, (hr, lr), *_ = _setup(
        {"cfg_dropout_prob": 1.0, "condition_noise_ratio": 0.0}
    )
    jstep = jax.jit(step)
    _, m1 = jstep(state, hr, lr)
    _, m2 = jstep(state, hr, lr * 5.0 + 1.0)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_eval_step_runs():
    state, _, (hr, lr), lcfg, norm = _setup()
    ev = jax.jit(make_eval_step(lcfg, norm))
    metrics = ev(state, hr, lr, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_spmd_matches_single_device(mesh_shape):
    """DP and DPxTP sharded execution must reproduce the single-device loss
    (this replaces the reference's untestable NCCL path, SURVEY.md §4)."""
    state, step, (hr, lr), *_ = _setup({"condition_noise_ratio": 0.0})
    hr = jnp.tile(hr, (2, 1, 1))  # batch 8 = one sample per data shard
    lr = jnp.tile(lr, (2, 1, 1))
    ref_metrics = jax.jit(step)(state, hr, lr)[1]

    mesh = make_mesh(*mesh_shape)
    pspec = param_shardings(mesh, state.params)
    rep = replicated(mesh)
    sharded_params = jax.device_put(state.params, pspec)
    sharded_state = state.replace(
        params=sharded_params,
        opt_state=jax.device_put(state.opt_state, jax.tree_util.tree_map(
            lambda _: rep, state.opt_state,
            is_leaf=lambda x: isinstance(x, jax.Array))),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
    bs = batch_sharding(mesh)
    hr_s = jax.device_put(hr, bs)
    lr_s = jax.device_put(lr, bs)
    new_state, metrics = jax.jit(step)(sharded_state, hr_s, lr_s)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    # One more step to ensure the updated (sharded) state is consumable.
    _, m2 = jax.jit(step)(new_state, hr_s, lr_s)
    assert np.isfinite(float(m2["loss"]))


def test_zero1_opt_state_sharding_matches():
    """ZeRO-1: moments sharded over the data axis must give identical
    training results (GSPMD handles the gathers)."""
    from jatsr_tpu.parallel.mesh import opt_state_shardings

    state, step, (hr, lr), *_ = _setup(
        {"condition_noise_ratio": 0.0, "adam_moments_dtype": "bfloat16"}
    )
    hr = jnp.tile(hr, (2, 1, 1))
    lr = jnp.tile(lr, (2, 1, 1))
    # two steps unsharded
    s_ref = state
    jstep = jax.jit(step)
    for _ in range(2):
        s_ref, m_ref = jstep(s_ref, hr, lr)

    mesh = make_mesh(4, 2)
    rep = replicated(mesh)
    s_sh = state.replace(
        params=jax.device_put(state.params, param_shardings(mesh, state.params)),
        opt_state=jax.device_put(state.opt_state,
                                 opt_state_shardings(mesh, state.opt_state)),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
    bs = batch_sharding(mesh)
    hr_s, lr_s = jax.device_put(hr, bs), jax.device_put(lr, bs)
    for _ in range(2):
        s_sh, m_sh = jstep(s_sh, hr_s, lr_s)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)


def test_grad_accumulation_runs_and_converges():
    """grad_accum_steps splits the batch into micro-steps; loss must still
    fall on an overfit batch and metrics stay finite."""
    state, step, (hr, lr), *_ = _setup(
        {"condition_noise_ratio": 0.0, "lr": 3e-4, "warmup_steps": 10,
         "grad_accum_steps": 2}
    )
    jstep = jax.jit(step, donate_argnums=(0,))
    first = None
    for _ in range(60):
        state, m = jstep(state, hr, lr)
        if first is None:
            first = float(m["loss"])
    assert np.isfinite(float(m["grad_norm"]))
    assert float(m["loss"]) < 0.8 * first


def test_normalizer_roundtrip():
    rs = np.random.RandomState(0)
    mu, sd = rs.randn(C), np.abs(rs.randn(C)) + 0.5
    norm = Normalizer(mu, sd, mu, sd)
    x = jnp.asarray(rs.randn(2, 5, C), jnp.float32)
    back = norm.denorm_hr(norm.norm_hr(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("policy", ["attn_out", "mlp"])
def test_selective_remat_gradient_parity(policy):
    """Selective remat policies are pure FLOPs/HBM trades — gradients must
    match full remat (the "mlp" policy additionally saves the pre-GELU
    activations, VERDICT r4 #6)."""
    rs = np.random.RandomState(1)
    hr = jnp.asarray(rs.randn(2, 24, 1024), jnp.float32)
    lr = jnp.asarray(rs.randn(2, 24, 1024), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)

    def grads_for(remat_policy):
        mcfg = dataclasses.replace(PRESET.model, remat_policy=remat_policy,
                                   dropout=0.0, drop_path_rate=0.0,
                                   dtype="float32")
        model = DiT(mcfg)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            hr, t, lr)["params"]

        def loss(p):
            pred = model.apply({"params": p}, hr, t, lr,
                               deterministic=True)
            return jnp.mean((pred - hr) ** 2)

        return jax.grad(loss)(params)

    g_full = grads_for("full")
    g_sel = grads_for(policy)
    flat_full = jax.tree_util.tree_leaves(g_full)
    flat_sel = jax.tree_util.tree_leaves(g_sel)
    for a, b in zip(flat_full, flat_sel):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
