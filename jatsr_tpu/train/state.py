"""Train state: params + AdamW(+clip) optimizer + PRNG key.

Replaces the reference's AdamW + GradScaler + manual LR loop
(train_ddp_v3mod2.py:709-717, 745): on TPU we train in bf16 compute with
fp32 params, so there is no loss scaling; the schedule lives inside the
optax chain; gradient clipping at global-norm 1.0 precedes AdamW exactly as
``clip_grad_norm_`` precedes ``optimizer.step()`` in the reference
(train_ddp_v3mod2.py:925-929).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import TrainConfig
from .schedule import warmup_cosine


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array  # folded into per-step rngs
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt
        )


def make_optimizer(cfg: TrainConfig, total_steps: int):
    import jax.numpy as jnp

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=warmup_cosine(cfg.lr, cfg.warmup_steps, total_steps),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
            mu_dtype=jnp.dtype(cfg.adam_moments_dtype),
        ),
    )


def create_train_state(
    model,
    cfg: TrainConfig,
    total_steps: int,
    sample_batch,
    seed: Optional[int] = None,
) -> TrainState:
    """Initialise params + optimizer from a (hr, lr) sample batch [B, T, C].

    Applies ``cfg.prng_impl`` first: the PRNG key's shape is part of the
    checkpointed state (rbg keys are uint32[4], threefry uint32[2]), so a
    restore template must be built under the same implementation.
    """
    from ..utils.runtime import select_prng_impl

    select_prng_impl(cfg.prng_impl)
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    init_key, state_key = jax.random.split(key)
    hr, lr = sample_batch
    t = jnp.zeros((hr.shape[0],), jnp.float32)
    params = model.init(
        {"params": init_key, "dropout": init_key}, hr, t, lr
    )["params"]
    tx = make_optimizer(cfg, total_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_key,
        tx=tx,
        apply_fn=model.apply,
    )
