"""Jitted train / eval steps (the reference hot loop, one XLA program).

One ``train_step`` fuses everything the reference does per step
(train_ddp_v3mod2.py:842-931): normalization, adaptive condition-noise
augmentation, sample-level CFG dropout (v3m2 line, train_ddp_v3m2.py:566-571),
U-shaped t sampling, flow interpolation, DiT forward, the loss stack,
backward, global-norm clip, AdamW update — plus the logged metrics
(GradNorm, SNR dB, prediction stats; train_ddp_v3mod2.py:901-919).

Under a device mesh the same program runs SPMD: batches sharded over
``data``, params optionally tensor-parallel over ``model``; XLA inserts the
gradient reductions the reference got from DDP/NCCL.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import LossConfig, TrainConfig
from ..losses import total_training_loss
from ..sampling import flow_interpolate, u_shaped_timesteps
from .state import TrainState


class Normalizer:
    """Per-channel latent normalization from global stats [C]
    (ref train_ddp_v3mod2.py:459-470, 856-857)."""

    def __init__(self, hr_mean, hr_std, lr_mean, lr_std):
        as_row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, 1, -1)
        self.hr_mean, self.hr_std = as_row(hr_mean), as_row(hr_std)
        self.lr_mean, self.lr_std = as_row(lr_mean), as_row(lr_std)

    def norm_hr(self, x):
        return (x - self.hr_mean) / self.hr_std

    def norm_lr(self, x):
        return (x - self.lr_mean) / self.lr_std

    def denorm_hr(self, x):
        return x * self.hr_std + self.hr_mean


def make_train_step(
    loss_cfg: LossConfig, train_cfg: TrainConfig, normalizer: Normalizer
):
    """Build ``step(state, hr, lr) -> (state, metrics)`` (donating state)."""

    def step_fn(
        state: TrainState, hr: jax.Array, lr: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(state.rng, state.step)
        k_noise, k_t, k_cond, k_cfg, k_drop = jax.random.split(rng, 5)
        B = hr.shape[0]

        hr_norm = normalizer.norm_hr(hr)
        lr_norm = normalizer.norm_lr(lr)
        lr_orig = lr_norm  # pre-noise LR for the consistency loss

        # Adaptive condition noise (train_ddp_v3mod2.py:863-874).
        cond_noise_std = jnp.float32(0.0)
        if train_cfg.condition_noise_ratio > 0:
            batch_std = (
                jnp.clip(lr_norm.std(), 0.5, 2.0)
                if train_cfg.use_adaptive_noise
                else jnp.float32(1.0)
            )
            cond_noise_std = train_cfg.condition_noise_ratio * batch_std
            lr_norm = lr_norm + cond_noise_std * jax.random.normal(
                k_cond, lr_norm.shape, jnp.float32
            )

        # Sample-level CFG dropout AFTER cond-noise, so the null token stays
        # exactly zero (train_ddp_v3m2.py:566-571, verify_cfg_fix.py).
        if train_cfg.cfg_dropout_prob > 0:
            keep = (
                jax.random.uniform(k_cfg, (B, 1, 1))
                >= train_cfg.cfg_dropout_prob
            )
            lr_norm = lr_norm * keep.astype(lr_norm.dtype)

        t = u_shaped_timesteps(k_t, B, train_cfg.timestep_alpha)
        noise = jax.random.normal(k_noise, hr_norm.shape, jnp.float32)
        z_t = flow_interpolate(hr_norm, noise, t)

        def loss_fn(params, z_t_mb, t_mb, lr_mb, hr_mb, lr_orig_mb):
            pred = state.apply_fn(
                {"params": params},
                z_t_mb,
                t_mb,
                lr_mb,
                deterministic=False,
                rngs={"dropout": k_drop},
            )
            loss, metrics = total_training_loss(pred, hr_mb, lr_orig_mb,
                                                loss_cfg)
            return loss, (metrics, pred)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        A = train_cfg.grad_accum_steps
        if A <= 1:
            (loss, (metrics, pred)), grads = grad_fn(
                state.params, z_t, t, lr_norm, hr_norm, lr_orig
            )
        else:
            # Micro-batch accumulation under lax.scan: grads averaged, the
            # last micro-batch's pred retained for diagnostics.
            mb = B // A
            assert mb * A == B, (B, A)
            resh = lambda x: x.reshape((A, mb) + x.shape[1:])
            stacked = tuple(map(resh, (z_t, t, lr_norm, hr_norm, lr_orig)))

            def scan_body(carry, micro):
                g_acc, l_acc = carry
                (l, (m, p)), g = grad_fn(state.params, *micro)
                g_acc = jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g)
                return (g_acc, l_acc + l), (m, p)

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g_sum, l_sum), (ms, preds) = jax.lax.scan(
                scan_body, (zero_g, jnp.float32(0.0)), stacked
            )
            grads = jax.tree_util.tree_map(lambda g: g / A, g_sum)
            loss = l_sum / A
            metrics = jax.tree_util.tree_map(lambda x: x.mean(), ms)
            pred = preds.reshape((B,) + preds.shape[2:])

        new_state = state.apply_gradients(grads)

        # Diagnostics (train_ddp_v3mod2.py:901-919, 924-927).
        signal_power = (hr_norm**2).mean()
        noise_power = ((pred - hr_norm) ** 2).mean()
        metrics = dict(metrics)
        metrics.update(
            grad_norm=jax.tree_util.tree_reduce(
                lambda a, b: a + b,
                jax.tree_util.tree_map(lambda g: (g.astype(jnp.float32) ** 2).sum(), grads),
            )
            ** 0.5,
            snr_db=10.0 * jnp.log10(signal_power / (noise_power + 1e-8)),
            pred_mean=pred.mean(),
            pred_std=pred.std(),
            cond_noise_std=cond_noise_std,
        )
        return new_state, metrics

    return step_fn


def make_eval_step(loss_cfg: LossConfig, normalizer: Normalizer):
    """Validation step: uniform t, no augmentation, deterministic model
    (ref train_ddp_v3mod2.py:1045-1084)."""

    def eval_fn(state: TrainState, hr, lr, rng) -> Dict[str, jax.Array]:
        k_t, k_noise = jax.random.split(rng)
        B = hr.shape[0]
        hr_norm = normalizer.norm_hr(hr)
        lr_norm = normalizer.norm_lr(lr)
        t = jax.random.uniform(k_t, (B,), jnp.float32)
        noise = jax.random.normal(k_noise, hr_norm.shape, jnp.float32)
        z_t = flow_interpolate(hr_norm, noise, t)
        pred = state.apply_fn({"params": state.params}, z_t, t, lr_norm)
        loss, metrics = total_training_loss(pred, hr_norm, lr_norm, loss_cfg)
        return dict(metrics)

    return eval_fn
