"""Fused GQA attention — Pallas TPU kernel.

The reference computes attention naively: materialised QK^T scores, softmax,
then the value matmul (jat_audiosr_v2.py:155-161) — at N=345 patches the
[B, H, N, N] score tensor makes two HBM round-trips per layer.  This kernel
keeps the whole score/softmax/value pipeline in VMEM: one program per
(batch, query-head), Q/K/V tiles loaded once, logits in fp32 on the MXU,
masked softmax on the VPU, value matmul back on the MXU.

At DiT scale (N<=512, D=64) a full-sequence tile fits comfortably in VMEM
(scores 384x384 fp32 = 0.6 MB), so no online-softmax streaming is needed —
this is the "single-tile flash" regime.  KV heads are indexed through the
grid (head h reads KV head h // group), so grouped KV is never repeated in
memory (the reference repeat_interleaves it, jat_audiosr_v2.py:147-148).

Used on the deterministic (inference/serving) path; training keeps the XLA
einsum path, which autodiffs and applies attention dropout.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0, 0, :, :]  # [Np, D]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Np, Np]
    np_ = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.dot(w, v, preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Fused grouped-query attention.

    Args:
        q: [B, N, Hq, D]   (RoPE already applied)
        k: [B, N, Hkv, D]
        v: [B, N, Hkv, D]
    Returns:
        [B, N, Hq, D] in q's dtype.
    """
    B, N, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    scale = 1.0 / math.sqrt(D)

    # Pad sequence to the lane width.  The kernel runs head-major
    # [B, H, Np, D]: Mosaic requires the last two block dims tile-aligned
    # (Np % 8 == 0, D == full dim), which the [B, N, H, D] layout with a
    # blocked head axis cannot satisfy.
    Np = _round_up(N, 128)
    if Np != N:
        pad = ((0, 0), (0, Np - N), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qh = q.transpose(0, 2, 1, 3)  # [B, Hq, Np, D]
    kh = k.transpose(0, 2, 1, 3)  # [B, Hkv, Np, D]
    vh = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(_attn_kernel, scale=scale, n_valid=N)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Np, D), q.dtype),
        grid=(B, Hq),
        in_specs=[
            pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h // G, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h // G, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Np * Np * D,  # QK^T + WV per program
            bytes_accessed=3 * Np * D * 2 + Np * D * 2,
            transcendentals=Np * Np,
        ),
        interpret=interpret,
    )(qh, kh, vh)
    out = out.transpose(0, 2, 1, 3)  # back to [B, Np, Hq, D]
    return out[:, :N] if Np != N else out
