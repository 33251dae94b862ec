"""Dynamic W8A8 int8 matmuls for serving.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; for the
compute-bound 50-step CFG sampler this is the main single-chip throughput
lever beyond bf16 (the reference has no quantized path at all).

``int8_dot_general`` is a drop-in ``dot_general`` for ``nn.Dense``:

- weights: symmetric per-output-channel absmax scales.  Inside the
  sampler's ``fori_loop`` the weights are loop-invariant, so XLA hoists
  their quantisation out of the ODE loop — it happens once per call.
- activations: symmetric per-row (per-token) dynamic absmax scales.  The
  same activation feeds q/k/v; XLA CSEs the duplicate quantisations.
- the contraction: XLA's s8xs8 ``dot_general`` DOES hit the v5e MXU int8
  rate (tools/mxu_bench.py, amortized-loop timing: 257-332 TF/s vs
  160-187 TF/s bf16 at DiT shapes; round 1 measured the opposite through
  ~27 ms/dispatch tunnel overhead).  The dot runs at the ACTIVATION'S OWN
  RANK — collapsing [B, N, K] -> [B*N, K] around the dot costs 32% of
  end-to-end sampler throughput (50.9 -> 34.5 audio-sec/s; the reshape
  breaks XLA's producer fusion of the quantisation).  The Pallas kernel
  in ``ops.int8_matmul`` (tuned tiles, ~310 TF/s) stays selectable via
  JATSR_INT8_IMPL=pallas.
- accumulation in int32, rescale in fp32, result in the activation dtype.

int8 x int8 -> int32 is exact, so the XLA and Pallas paths agree to the
output-dtype rounding on any backend.

Opt-in via ``ModelConfig.matmul_precision="int8"`` (serving only; training
and the quality-parity path stay bf16/fp32).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .int8_matmul import _INV127, int8_matmul, int8_matmul_fused


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    ((lc, rc), (lb, rb)) = dimension_numbers
    # nn.Dense contraction: lhs [..., K] x rhs [K, N], no batch dims.
    if (len(lc) != 1 or len(rc) != 1 or lb or rb
            or lc[0] != lhs.ndim - 1 or rc[0] != 0 or rhs.ndim != 2):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    (lcd,), (rcd,) = lc, rc
    out_dtype = lhs.dtype
    K, N = rhs.shape

    rhs_f = rhs.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(rhs_f), axis=rcd, keepdims=True) * _INV127
    w_q = jnp.round(rhs_f / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)

    lead = lhs.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    impl = os.environ.get("JATSR_INT8_IMPL")
    aligned = K % 128 == 0 and N % 128 == 0 and M >= 32

    # Fused kernel: activations cross HBM once as bf16; per-row scales are
    # computed in VMEM (ops/int8_matmul.py).
    if impl == "fused" and jax.default_backend() == "tpu" and aligned:
        out = int8_matmul_fused(
            lhs.reshape(M, K), w_q, w_scale.reshape(1, N),
            out_dtype=out_dtype,
        )
        return out.reshape(*lead, N)

    lhs_f = lhs.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(lhs_f), axis=lcd, keepdims=True) * _INV127
    a_q = jnp.round(lhs_f / jnp.maximum(a_scale, 1e-12)).astype(jnp.int8)

    # Pallas opt-in (Mosaic tiling needs 2-D lane-aligned operands).
    if impl == "pallas" and jax.default_backend() == "tpu" and aligned:
        out = int8_matmul(
            a_q.reshape(M, K), a_scale.reshape(M, 1), w_q,
            w_scale.reshape(1, N), out_dtype=out_dtype,
        )
        return out.reshape(*lead, N)

    out = jax.lax.dot_general(
        a_q, w_q, dimension_numbers, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    a_s = jnp.squeeze(a_scale, axis=lcd)
    a_s = a_s.reshape(a_s.shape + (1,) * (rhs.ndim - 1))
    w_s = jnp.squeeze(w_scale, axis=rcd)
    return (out * a_s * w_s).astype(out_dtype)
