"""Dynamic W8A8 int8 matmuls for serving.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; for the
compute-bound 50-step CFG sampler this is the main single-chip throughput
lever beyond bf16 (the reference has no quantized path at all).

``int8_dot_general`` is a drop-in ``dot_general`` for ``nn.Dense``:

- weights: symmetric per-output-channel absmax scales.  Inside the
  sampler's ``fori_loop`` the weights are loop-invariant, so XLA hoists
  their quantisation out of the ODE loop — it happens once per call.
- activations: symmetric per-row (per-token) dynamic absmax scales.
- accumulation in int32, rescale in fp32, return in the activation dtype.

Opt-in via ``ModelConfig.matmul_precision="int8"`` (serving only; training
and the quality-parity path stay bf16/fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    ((lc, rc), (lb, rb)) = dimension_numbers
    # nn.Dense contraction: single contracting dim, no batch dims.
    if len(lc) != 1 or len(rc) != 1 or lb or rb:
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    (lcd,), (rcd,) = lc, rc
    out_dtype = lhs.dtype

    rhs_f = rhs.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(rhs_f), axis=rcd, keepdims=True) / 127.0
    w_q = jnp.round(rhs_f / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)

    lhs_f = lhs.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(lhs_f), axis=lcd, keepdims=True) / 127.0
    a_q = jnp.round(lhs_f / jnp.maximum(a_scale, 1e-12)).astype(jnp.int8)

    out = jax.lax.dot_general(
        a_q, w_q, dimension_numbers, preferred_element_type=jnp.int32
    ).astype(jnp.float32)

    # Broadcast the scales onto the output: activation scale keeps its
    # leading dims (contraction dim squeezed), weight scale maps to the
    # trailing output dims.
    a_s = jnp.squeeze(a_scale, axis=lcd)
    a_s = a_s.reshape(a_s.shape + (1,) * (rhs.ndim - 1))
    w_s = jnp.squeeze(w_scale, axis=rcd)
    return (out * a_s * w_s).astype(out_dtype)
