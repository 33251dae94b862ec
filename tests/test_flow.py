"""Flow-matching math + Euler/CFG sampler properties
(ref infer_test_v3m2.py:107-185, train_ddp_v3mod2.py:449-457)."""

import jax
import jax.numpy as jnp
import numpy as np

from jatsr_tpu.configs import SamplerConfig
from jatsr_tpu.sampling import FlowSampler, flow_interpolate, u_shaped_timesteps


def test_interpolation_endpoints():
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.full((2, 4, 3), -1.0)
    z0 = flow_interpolate(x0, noise, jnp.zeros(2))
    z1 = flow_interpolate(x0, noise, jnp.ones(2))
    np.testing.assert_allclose(np.asarray(z0), -1.0)
    np.testing.assert_allclose(np.asarray(z1), 1.0)


def test_u_shaped_distribution():
    t = np.asarray(u_shaped_timesteps(jax.random.PRNGKey(0), 20000, alpha=0.5))
    assert t.min() >= 0.0 and t.max() <= 1.0
    # With alpha=0.5 the reference mapping has pdf(t) = 4t on [0, 0.5]
    # (mirrored above): mass concentrates towards t=0.5, away from edges.
    # (Despite the "U-shaped" name, this is what train_ddp_v3mod2.py:449-457
    # computes; we reproduce the formula, and this pins its actual shape.)
    edges = np.mean((t < 0.1) | (t > 0.9))
    mid = np.mean((t > 0.45) & (t < 0.55))
    assert mid > 2.0 * edges
    # Symmetry around 0.5.
    assert abs(t.mean() - 0.5) < 0.01


def test_u_shaped_matches_reference_formula():
    """Transcription check of train_ddp_v3mod2.py:449-457."""
    key = jax.random.PRNGKey(1)
    u = np.asarray(jax.random.uniform(key, (1000,), dtype=jnp.float32))
    want = np.where(u < 0.5, (2 * u) ** 0.5 / 2, 1 - ((2 * (1 - u)) ** 0.5) / 2)
    got = np.asarray(u_shaped_timesteps(key, 1000, alpha=0.5))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_euler_converges_to_oracle_x0():
    """A model that always predicts the target x0 must be integrated back to
    exactly that x0 (the t>=0.999 jump guarantees the endpoint)."""
    target = jnp.asarray(np.random.RandomState(0).randn(2, 8, 4), jnp.float32)
    sampler = FlowSampler(lambda z, t, c: target, SamplerConfig(num_steps=25))
    out = sampler(jax.random.PRNGKey(0), jnp.zeros((2, 8, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)


def test_cfg_formula():
    """model = identity-on-cond  =>  CFG output = s*cond (uncond half sees a
    zero condition), per infer_test_v3m2.py:163-164."""
    cond = jnp.asarray(np.random.RandomState(1).randn(3, 8, 4), jnp.float32)
    sampler = FlowSampler(lambda z, t, c: c, SamplerConfig(num_steps=10))
    out = sampler(jax.random.PRNGKey(0), cond, cfg_scale=2.0)
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(cond), atol=1e-4)


def test_cfg_scale_one_equals_uncond_path():
    cond = jnp.asarray(np.random.RandomState(2).randn(1, 8, 4), jnp.float32)
    f = lambda z, t, c: 0.5 * c + 0.1 * z
    a = FlowSampler(f, SamplerConfig(num_steps=8))(jax.random.PRNGKey(3), cond)
    b = FlowSampler(f, SamplerConfig(num_steps=8, cfg_scale=1.0))(
        jax.random.PRNGKey(3), cond
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_renoise_sampler_oracle():
    """Re-noising sampler with an oracle x0-model converges to x0 exactly
    (final step returns x_pred when t_next == 1)."""
    target = jnp.asarray(np.random.RandomState(5).randn(2, 8, 4), jnp.float32)
    s = FlowSampler(lambda z, t, c: target, SamplerConfig(num_steps=10))
    out = s.renoise_sample(jax.random.PRNGKey(0), jnp.zeros((2, 8, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-5)


def test_heun_solver_oracle_and_accuracy():
    """Heun converges to the oracle x0 like Euler, and on a z-dependent
    model it tracks the true ODE solution more accurately at equal step
    count."""
    target = jnp.asarray(np.random.RandomState(7).randn(2, 8, 4), jnp.float32)
    heun = FlowSampler(lambda z, t, c: target,
                       SamplerConfig(num_steps=12, solver="heun"))
    out = heun(jax.random.PRNGKey(0), jnp.zeros((2, 8, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-4)

    # model x0(z,t) = c + 0.5*z gives a linear but stiffening ODE; compare
    # few-step solvers against a dense-step Euler reference
    f = lambda z, t, c: c + 0.5 * z
    cond = jnp.asarray(np.random.RandomState(8).randn(1, 8, 4), jnp.float32)
    key = jax.random.PRNGKey(3)
    dense = FlowSampler(f, SamplerConfig(num_steps=800))(key, cond)
    few_euler = FlowSampler(f, SamplerConfig(num_steps=10))(key, cond)
    few_heun = FlowSampler(f, SamplerConfig(num_steps=10, solver="heun"))(key, cond)
    err_e = float(jnp.abs(few_euler - dense).mean())
    err_h = float(jnp.abs(few_heun - dense).mean())
    assert err_h < err_e, (err_h, err_e)


def test_sampler_deterministic_per_key():
    f = lambda z, t, c: 0.3 * c + 0.2 * z
    cond = jnp.asarray(np.random.RandomState(4).randn(1, 8, 4), jnp.float32)
    s = FlowSampler(f, SamplerConfig(num_steps=6))
    a = s(jax.random.PRNGKey(5), cond)
    b = s(jax.random.PRNGKey(5), cond)
    c2 = s(jax.random.PRNGKey(6), cond)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c2))


def test_int8_sampler_path():
    """int8 serving model inside the jitted ODE loop: finite outputs close
    to the bf16 path (weight quantisation is loop-invariant and hoisted)."""
    import dataclasses
    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.models import DiT

    base = get_preset("tiny").model
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (1, 24, base.input_channels))
    outs = {}
    for prec in ("bf16", "int8"):
        cfg = dataclasses.replace(base, dropout=0.0, matmul_precision=prec)
        model = DiT(cfg)
        params = model.init({"params": key, "dropout": key}, cond,
                            jnp.zeros((1,)), cond)["params"]
        params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
        s = FlowSampler(lambda p, z, t, c: model.apply({"params": p}, z, t, c),
                        SamplerConfig(num_steps=6), params=params)
        outs[prec] = np.asarray(s(jax.random.PRNGKey(1), cond))
    assert np.isfinite(outs["int8"]).all()
    denom = np.abs(outs["bf16"]).mean() + 1e-6
    assert np.abs(outs["int8"] - outs["bf16"]).mean() / denom < 0.2


def test_cfg_interval_full_matches_plain_cfg():
    """cfg_interval=(0,1) must take the plain always-guided path; an
    explicitly materialised (0, n) interval sampler produces identical
    trajectories."""
    cond = jnp.asarray(np.random.RandomState(5).randn(2, 8, 4), jnp.float32)
    f = lambda z, t, c: 0.3 * c + 0.2 * z
    a = FlowSampler(f, SamplerConfig(num_steps=10))(
        jax.random.PRNGKey(4), cond, cfg_scale=2.5)
    s = FlowSampler(f, SamplerConfig(num_steps=10, cfg_interval=(0.0, 1.0)))
    z0 = jax.random.normal(jax.random.PRNGKey(4), cond.shape, jnp.float32)
    ts = jnp.linspace(0.0, 1.0, 11, jnp.float32)
    b = s._sample_cfg_interval(None, cond, z0, ts, 0, 10, jnp.float32(2.5))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cfg_interval_limits_guidance():
    """With guidance limited to the middle of the schedule, the endpoint is
    still the oracle x0 (identity-predictor), and counting model batch
    sizes confirms the unguided segments run at B, not 2B."""
    calls = []

    def f(z, t, c):
        calls.append(int(z.shape[0]))
        return c

    cond = jnp.asarray(np.random.RandomState(6).randn(2, 8, 4), jnp.float32)
    scfg = SamplerConfig(num_steps=10, cfg_interval=(0.2, 0.8))
    out = FlowSampler(f, scfg)(jax.random.PRNGKey(1), cond, cfg_scale=2.0)
    assert np.isfinite(np.asarray(out)).all()
    # trace-time shapes: one 2B trace (guided body) and one B trace each
    # for the head/tail unguided loops
    assert 4 in calls and 2 in calls


def test_cfg_interval_zero_width_is_uncond():
    """A degenerate interval guides nowhere: equals the cfg_scale-agnostic
    conditional-only trajectory."""
    cond = jnp.asarray(np.random.RandomState(7).randn(1, 8, 4), jnp.float32)
    f = lambda z, t, c: 0.5 * c + 0.1 * z
    plain = FlowSampler(f, SamplerConfig(num_steps=8))(
        jax.random.PRNGKey(2), cond)  # cfg_scale=1 -> nocfg path
    s = FlowSampler(f, SamplerConfig(num_steps=8, cfg_interval=(0.0, 0.0)))
    lim = s(jax.random.PRNGKey(2), cond, cfg_scale=3.0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(lim), atol=1e-6)


def test_cfg_split_matches_doubled():
    """cfg_batching="split" (two batch-B forwards) must reproduce the
    doubled-batch guided sampler exactly on fp32 CPU: same math, only the
    batch shape of the model calls differs (PERF.md round 4).  Uses a
    nonlinear batch-independent model so any cond/uncond mix-up or
    batch-concat mistake would change the output."""
    def f(z, t, c):
        return jnp.tanh(z) * 0.1 + c * (0.5 + 0.5 * t[:, None, None])

    cond = jax.random.normal(jax.random.PRNGKey(11), (3, 8, 4))
    key = jax.random.PRNGKey(12)
    a = FlowSampler(f, SamplerConfig(num_steps=12))(key, cond, cfg_scale=3.0)
    b = FlowSampler(f, SamplerConfig(num_steps=12, cfg_batching="split"))(
        key, cond, cfg_scale=3.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
    # Heun + interval window exercise the other guided-body variants.
    c1 = FlowSampler(f, SamplerConfig(num_steps=10, solver="heun",
                                      cfg_interval=(0.1, 0.8)))(
        key, cond, cfg_scale=2.0)
    c2 = FlowSampler(f, SamplerConfig(num_steps=10, solver="heun",
                                      cfg_interval=(0.1, 0.8),
                                      cfg_batching="split"))(
        key, cond, cfg_scale=2.0)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-6, atol=1e-6)
