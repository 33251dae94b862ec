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

from .int8_matmul import _INV127 as _INV127_A


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Per-program VMEM budget for the single-tile flash kernels.  v5e has
# ~16 MB of VMEM; leave headroom for Mosaic's own buffers.  Past this the
# kernels fail Mosaic compilation with an opaque allocation error, so the
# model falls back to the XLA einsum path instead (ADVICE r2 #3).
_FLASH_VMEM_BUDGET = 12 * 1024 * 1024


def flash_supported(n: int, num_q_heads: int, num_kv_heads: int,
                    d: int) -> bool:
    """Whether the flash kernels' whole-sequence tiles fit VMEM at this
    geometry.  Counts the qkv block, the output block, k/v work copies and
    three [Np, Np] fp32 score-sized temporaries (score + pipelined next +
    exp).  At the production N=345 this is ~4 MB; N around 1378 (a whole
    16 s chunk unpatchified) blows the budget."""
    np_ = _round_up(n, 8)
    td = (num_q_heads + 2 * num_kv_heads) * d
    est = (np_ * td * 2                 # qkv (or q+k+v) bf16
           + np_ * num_q_heads * d * 2  # output
           + np_ * 2 * num_kv_heads * d * 2  # rope'd k + v copies
           + 3 * np_ * np_ * 4)         # fp32 score temporaries
    return est <= _FLASH_VMEM_BUDGET


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


def _attn_kernel_flash(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       n_valid: int, hq: int, hkv: int, d: int):
    """One program = one batch element, ALL heads, natural [Np, H*D]
    layout (no relayout/transpose outside the kernel — the cost that sank
    the first two kernels).  Heads are static column slices; the next
    head's score dot is issued before the current head's softmax so the
    MXU streams while the VPU works (same manual-pipeline trick as the
    fused MLP kernel)."""
    g = hq // hkv
    q = q_ref[0]  # [Np, Hq*D]
    k = k_ref[0]  # [Np, Hkv*D]
    v = v_ref[0]
    np_ = q.shape[0]
    # The wrapper zero-pads q/k/v to Np rows, so padded keys score exactly
    # 0 and padded v rows add nothing to e @ v — no [Np, Np] masking
    # needed, just the npad * exp(-m) denominator correction (see
    # _attn_kernel_flash_qkv).
    npad = np_ - n_valid

    # Base-2 softmax (see _attn_kernel_flash_qkv): scale * log2(e) folded
    # into the [Np, D] q slice, scores in the log2 domain, exp2 epilogue.
    scale2 = scale * math.log2(math.e)

    def score(h):
        kv, _ = divmod(h, g)
        return jax.lax.dot_general(
            q[:, h * d:(h + 1) * d] * jnp.asarray(scale2, q.dtype),
            k[:, kv * d:(kv + 1) * d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s_next = score(0)
    for h in range(hq):
        s = s_next
        if h + 1 < hq:
            s_next = score(h + 1)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        # Deferred softmax normalisation (see _attn_kernel_flash_qkv).
        denom = jnp.sum(e, axis=-1, keepdims=True)
        if npad:
            denom = denom - npad * jnp.exp2(-m)
        r = 1.0 / denom
        kv = h // g
        o = jnp.dot(e.astype(v.dtype), v[:, kv * d:(kv + 1) * d],
                    preferred_element_type=jnp.float32) * r
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_q_heads", "num_kv_heads",
                                             "interpret"))
def gqa_attention_flash(q: jax.Array, k: jax.Array, v: jax.Array,
                        num_q_heads: int, num_kv_heads: int,
                        interpret: bool = False) -> jax.Array:
    """Fused GQA, one program per batch element, flat head layout.

    Args:
        q: [B, N, Hq*D] (RoPE already applied, flat head-major columns)
        k/v: [B, N, Hkv*D]
    Returns:
        [B, N, Hq*D] in q's dtype.

    v3 of the attention kernels: consumes the projection outputs' natural
    layout, so the only HBM cost beyond q/k/v/out is the 8-sublane pad of
    N.  Scores/softmax stay in VMEM (f32 — no bf16 round, strictly more
    precise than the scores_dtype=bfloat16 XLA path)."""
    B, N, QD = q.shape
    D = QD // num_q_heads
    scale = 1.0 / math.sqrt(D)
    Np = _round_up(N, 8)
    if Np != N:
        pad = ((0, 0), (0, Np - N), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    kernel = functools.partial(
        _attn_kernel_flash, scale=scale, n_valid=N,
        hq=num_q_heads, hkv=num_kv_heads, d=D,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, QD), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, QD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, k.shape[2]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, v.shape[2]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, QD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * num_q_heads * Np * Np * D,
            bytes_accessed=2 * Np * QD * 2 + 2 * Np * k.shape[2] * 2,
            transcendentals=num_q_heads * Np * Np,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N] if Np != N else out


def _attn_kernel_flash_qkv(qkv_ref, cos_ref, sin_ref, o_ref, *,
                           scale: float, n_valid: int, hq: int, hkv: int,
                           d: int, int8_qk: bool = False,
                           bf16_weights: bool = False,
                           pipeline_v: bool = False):
    """Flash v3.1: consumes the UNSPLIT fused-QKV projection output and
    applies RoPE in-kernel — the XLA-level qkv split slices + rotate-half
    concats (~1.3 ms/step at v3 geometry) disappear into VPU work that
    overlaps the MXU head loop.

    ``int8_qk`` (hybrid v3.4, OPT-IN, quality-gate before defaulting):
    the VALUE dot runs s8 x s8 -> s32 at double MXU rate — softmax
    weights quantised with a FIXED 127 scale (exp(s - m) has row max
    exactly 1, so no absmax reduce is needed), v per COLUMN (the scales
    factor out of the contraction exactly).  Scores stay bf16: the
    original full-int8 v3.3 (q/k per-row quant) measured 89.96 vs 100.6
    — the per-row quant chains cost more than the double-rate score dot
    saves at D=64."""
    g = hq // hkv
    qkv = qkv_ref[0]          # [Np, (Hq + 2 Hkv) * D]
    np_ = qkv.shape[0]
    cos = cos_ref[:].astype(qkv.dtype)
    sin = sin_ref[:].astype(qkv.dtype)
    # NOTE (measured): replacing the per-head [Np, Np] score select with
    # zeroed K/V rows + an npad*exp(-m) denominator correction LOSES
    # ~0.5% end-to-end — the k/v masking multiplies land in the serial
    # pre-loop prep (not overlapped with the MXU), while the per-head
    # select rides the pipelined softmax epilogue.  Keep the select.
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    mask = col < n_valid

    def rope(x):  # [Np, D], half-rotation form (models/dit.py:apply_rope)
        x1, x2 = x[:, : d // 2], x[:, d // 2:]
        xr = jnp.concatenate([-x2, x1], axis=1)
        return x * cos + xr * sin

    k0 = hq * d
    v0 = (hq + hkv) * d
    ks = [rope(qkv[:, k0 + h * d: k0 + (h + 1) * d]) for h in range(hkv)]
    if int8_qk:
        # Hybrid v3.4: scores stay bf16 (per-row q/k quant chains measured
        # a net loss at D=64 — PERF.md flash v3.3), but the VALUE dot runs
        # s8 x s8 at double MXU rate: v per-COLUMN quantised once per kv
        # head, and the softmax weights need NO absmax reduce at all
        # because exp(s - m) has row max exactly 1 (fixed 127 scale).
        vs = []
        for h in range(hkv):
            v = qkv[:, v0 + h * d: v0 + (h + 1) * d].astype(jnp.float32)
            sv = jnp.maximum(
                jnp.max(jnp.abs(v), axis=0, keepdims=True) * _INV127_A,
                1e-12)  # per-COLUMN: factors out of the key contraction
            vs.append((jnp.round(v / sv).astype(jnp.int8), sv))
    else:
        vs = [qkv[:, v0 + h * d: v0 + (h + 1) * d] for h in range(hkv)]

    # Base-2 softmax: fold scale * log2(e) into q BEFORE the score dot
    # ([Np, D] multiply) so the scores land directly in the log2 domain.
    # exp(s*scale - m) == exp2(s2 - m2) with s2 = s * scale * log2(e) —
    # identical softmax weights, but the per-head [Np, Np] scale multiply
    # AND the multiply inside exp's exp2-based lowering both disappear
    # (two full score-sized VPU passes -> one [Np, D] multiply).
    scale2 = scale * math.log2(math.e)

    def score(h):
        q_h = rope(qkv[:, h * d:(h + 1) * d]) * jnp.asarray(
            scale2, qkv.dtype)
        s = jax.lax.dot_general(
            q_h, ks[h // g],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(mask, s, -jnp.inf)

    def value_dot(e, r, h):
        if int8_qk:
            # e's row max is EXACTLY 1 (exp(0) at the max-shifted column),
            # so a fixed 127 scale quantises it with no absmax reduce —
            # the per-row abs/max/divide chain that originally sank the
            # int8 value dot (PERF.md flash v3.3) disappears.
            w_q = jnp.round(e * 127.0).astype(jnp.int8)
            v_q, sv = vs[h // g]
            acc = jnp.dot(w_q, v_q, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (r * (1.0 / 127.0)) * sv
        return jnp.dot(e.astype(qkv.dtype), vs[h // g],
                       preferred_element_type=jnp.float32) * r

    def epilogue(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        if bf16_weights:
            e = jnp.exp2((s - m).astype(jnp.bfloat16))
        else:
            e = jnp.exp2(s - m)
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        return e, r

    def store(o, h, o_even):
        """Paired head stores (see the h % 2 comment below); returns the
        buffered even head."""
        if h % 2 == 0:
            return o
        o_ref[0, :, (h - 1) * d:(h + 1) * d] = jnp.concatenate(
            [o_even, o], axis=1).astype(o_ref.dtype)
        return None

    if pipeline_v:
        # v3.5 — softmax epilogue hidden under the MXU stream (VERDICT r4
        # #1): head h's value dot is DEFERRED one iteration, so the issue
        # order per step is  [score dot h+1 | value dot h-1 | epilogue h]
        # — the VPU epilogue sits between two MXU dots it has no data
        # dependency on, giving Mosaic a full two-dot window to overlap
        # it, instead of the value dot of the SAME head blocking on it.
        # Identical math and identical VMEM high-water mark (s_cur,
        # s_next, e — the same 3 score-sized temporaries).
        s_cur = score(0)
        pend = None   # (e, r) of head h-1, value dot not yet issued
        o_even = None
        for h in range(hq):
            s_next = score(h + 1) if h + 1 < hq else None
            if pend is not None:
                o = value_dot(*pend, h - 1)
                o_even = store(o, h - 1, o_even)
            pend = epilogue(s_cur)
            s_cur = s_next
        o = value_dot(*pend, hq - 1)
        o_even = store(o, hq - 1, o_even)
        if hq % 2:
            o_ref[0, :, (hq - 1) * d:] = o_even.astype(o_ref.dtype)
        return

    s_next = score(0)
    for h in range(hq):
        s = s_next
        if h + 1 < hq:
            s_next = score(h + 1)
        m = jnp.max(s, axis=-1, keepdims=True)
        if bf16_weights:
            # The softmax weights are consumed in bf16 by the value dot
            # anyway (and the XLA serving path's scores_dtype=bfloat16 is
            # quality-gated at the same precision), so round BEFORE the
            # transcendental — the VPU runs exp2 at the half-width rate and
            # the separate fp32->bf16 convert pass disappears.  The row sum
            # still accumulates in fp32.
            e = jnp.exp2((s - m).astype(jnp.bfloat16))
        else:
            e = jnp.exp2(s - m)
        # Deferred softmax normalisation: dot the UNnormalised e with v and
        # scale the [Np, D] output by the reciprocal row sum — identical
        # math, but the divide shrinks from Np*Np to Np*D elements (5.5x
        # less VPU work at N=352, D=64).
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        if int8_qk:
            # e's row max is EXACTLY 1 (exp(0) at the max-shifted column),
            # so a fixed 127 scale quantises it with no absmax reduce —
            # the per-row abs/max/divide chain that originally sank the
            # int8 value dot (PERF.md flash v3.3) disappears.
            w_q = jnp.round(e * 127.0).astype(jnp.int8)
            v_q, sv = vs[h // g]
            acc = jnp.dot(w_q, v_q, preferred_element_type=jnp.int32)
            o = acc.astype(jnp.float32) * (r * (1.0 / 127.0)) * sv
        else:
            o = jnp.dot(e.astype(qkv.dtype), vs[h // g],
                        preferred_element_type=jnp.float32) * r
        # Pair head stores: at D=64 a single head's column slice is half a
        # 128-lane register, so buffer even heads and store [Np, 2D] lane-
        # aligned blocks on odd heads.
        if h % 2 == 0:
            o_prev = o
        else:
            o_ref[0, :, (h - 1) * d:(h + 1) * d] = jnp.concatenate(
                [o_prev, o], axis=1).astype(o_ref.dtype)
    if hq % 2:
        o_ref[0, :, (hq - 1) * d:] = o_prev.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_q_heads", "num_kv_heads",
                                             "interpret", "n_valid",
                                             "int8_qk", "bf16_weights",
                                             "pipeline_v"))
def gqa_attention_flash_qkv(qkv: jax.Array, cos: jax.Array, sin: jax.Array,
                            num_q_heads: int, num_kv_heads: int,
                            interpret: bool = False,
                            n_valid: int = 0,
                            int8_qk: bool = False,
                            bf16_weights: bool = False,
                            pipeline_v: bool = False) -> jax.Array:
    """Flash GQA from the raw fused-QKV projection output.

    Args:
        qkv: [B, N, (Hq + 2*Hkv) * D] — q heads, then k heads, then v
            heads, PRE-RoPE (rotation happens in-kernel).
        cos/sin: [N, D] fp32 RoPE tables.
        n_valid: real sequence length when the caller already padded N to
            a sublane multiple (positions >= n_valid are masked as keys);
            0 means N itself.
    Returns:
        [B, N, Hq*D] in qkv's dtype.
    """
    B, N, TD = qkv.shape
    D = TD // (num_q_heads + 2 * num_kv_heads)
    scale = 1.0 / math.sqrt(D)
    Np = _round_up(N, 8)
    if Np != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
        pad_t = ((0, Np - N), (0, 0))
        cos, sin = jnp.pad(cos, pad_t), jnp.pad(sin, pad_t)

    kernel = functools.partial(
        _attn_kernel_flash_qkv, scale=scale, n_valid=n_valid or N,
        hq=num_q_heads, hkv=num_kv_heads, d=D, int8_qk=int8_qk,
        bf16_weights=bf16_weights, pipeline_v=pipeline_v,
    )
    QD = num_q_heads * D
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, QD), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, TD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, QD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * num_q_heads * Np * Np * D,
            bytes_accessed=Np * TD * 2 + Np * QD * 2,
            transcendentals=num_q_heads * Np * Np,
        ),
        interpret=interpret,
    )(qkv, cos, sin)
    return out[:, :N] if Np != N else out


def _attn_kernel_flash_out(qkv_ref, cos_ref, sin_ref, wo_ref, wos_ref,
                           bo_ref, o_ref, *, scale: float, n_valid: int,
                           hq: int, hkv: int, d: int):
    """Flash v3.2: v3.1 plus the OUTPUT PROJECTION fused in.  The
    per-head attention outputs are assembled in VMEM, row-quantised once
    (same per-row absmax the unfused QuantDense out_proj would apply) and
    hit the int8 out-projection weights without ever visiting HBM."""
    g = hq // hkv
    qkv = qkv_ref[0]
    np_ = qkv.shape[0]
    cos = cos_ref[:].astype(qkv.dtype)
    sin = sin_ref[:].astype(qkv.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), dimension=1)
    mask = col < n_valid

    def rope(x):
        x1, x2 = x[:, : d // 2], x[:, d // 2:]
        xr = jnp.concatenate([-x2, x1], axis=1)
        return x * cos + xr * sin

    k0 = hq * d
    v0 = (hq + hkv) * d
    ks = [rope(qkv[:, k0 + h * d: k0 + (h + 1) * d]) for h in range(hkv)]
    vs = [qkv[:, v0 + h * d: v0 + (h + 1) * d] for h in range(hkv)]

    # Base-2 softmax (see _attn_kernel_flash_qkv).
    scale2 = scale * math.log2(math.e)

    def score(h):
        q_h = rope(qkv[:, h * d:(h + 1) * d]) * jnp.asarray(
            scale2, qkv.dtype)
        s = jax.lax.dot_general(
            q_h, ks[h // g],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(mask, s, -jnp.inf)

    s_next = score(0)
    outs = []
    for h in range(hq):
        s = s_next
        if h + 1 < hq:
            s_next = score(h + 1)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
        o = jnp.dot(w, vs[h // g], preferred_element_type=jnp.float32)
        outs.append(o.astype(qkv.dtype))
    o_full = jnp.concatenate(outs, axis=1).astype(jnp.float32)  # [Np, HqD]
    so = jnp.maximum(
        jnp.max(jnp.abs(o_full), axis=1, keepdims=True) * _INV127_A, 1e-12
    )
    o_q = jnp.round(o_full / so).astype(jnp.int8)
    acc = jnp.dot(o_q, wo_ref[:], preferred_element_type=jnp.int32)
    o_ref[0] = (acc.astype(jnp.float32) * so * wos_ref[:]
                + bo_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_q_heads", "num_kv_heads",
                                             "interpret", "n_valid"))
def gqa_attention_flash_out(qkv: jax.Array, cos: jax.Array, sin: jax.Array,
                            wo_q: jax.Array, wo_scale: jax.Array,
                            wo_bias: jax.Array,
                            num_q_heads: int, num_kv_heads: int,
                            interpret: bool = False,
                            n_valid: int = 0) -> jax.Array:
    """Flash GQA + fused int8 output projection.

    Args:
        qkv: [B, N, (Hq + 2*Hkv) * D] pre-RoPE fused projection output.
        cos/sin: [N, D] fp32 RoPE tables.
        wo_q / wo_scale / wo_bias: int8 out-proj kernel [Hq*D, H], fp32
            per-column scales [1, H], fp32 bias [1, H].
    Returns:
        [B, N, H] in qkv's dtype (the attention branch output, pre-
        residual).
    """
    B, N, TD = qkv.shape
    D = TD // (num_q_heads + 2 * num_kv_heads)
    scale = 1.0 / math.sqrt(D)
    Np = _round_up(N, 8)
    if Np != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
        pad_t = ((0, Np - N), (0, 0))
        cos, sin = jnp.pad(cos, pad_t), jnp.pad(sin, pad_t)

    H = wo_q.shape[1]
    kernel = functools.partial(
        _attn_kernel_flash_out, scale=scale, n_valid=n_valid or N,
        hq=num_q_heads, hkv=num_kv_heads, d=D,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, H), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, TD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q_heads * D, H), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, H), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * (2 * num_q_heads * Np * D
                            + num_q_heads * D * H),
            bytes_accessed=Np * TD * 2 + num_q_heads * D * H + Np * H * 2,
            transcendentals=num_q_heads * Np * Np,
        ),
        interpret=interpret,
    )(qkv, cos, sin, wo_q, wo_scale, wo_bias)
    return out[:, :N] if Np != N else out


def _attn_kernel_grouped(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         n_valid: int):
    """One program = one (batch, kv-head): all G query heads of the group
    stacked into the dot's M axis ([G*Np, D] @ [D, Np])."""
    q = q_ref[0, 0, :, :]  # [G*Np, D]
    k = k_ref[0, 0, :, :]  # [Np, D]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [G*Np, Np] fp32, lives only in VMEM
    rows, np_ = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, np_), dimension=1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jnp.dot(w, v, preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gqa_attention_grouped(q: jax.Array, k: jax.Array, v: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Fused GQA, one program per (batch, KV head).

    v2 of :func:`gqa_attention`: the per-(batch, q-head) grid launches
    B*Hq tiny programs whose [Np, D] @ [D, Np] dots underfill the MXU and
    whose per-program overhead dominates at N=345.  Folding the G query
    heads of a KV group into the dot's M axis gives B*Hkv programs of
    [G*Np, D] @ [D, Np] (G*Np = 1920 rows at v3 geometry) — better MXU
    occupancy, G-fold fewer K/V fetches, same VMEM-resident softmax.

    Args / returns: as :func:`gqa_attention` ([B, N, Hq, D] etc.).
    """
    B, N, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    scale = 1.0 / math.sqrt(D)

    Np = _round_up(N, 128)
    if Np != N:
        pad = ((0, 0), (0, Np - N), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # [B, Np, Hkv, G, D] -> [B, Hkv, G*Np, D]: query head h = kv*G + g, so
    # the reshape splits the head axis exactly along KV groups.
    qh = q.reshape(B, Np, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    qh = qh.reshape(B, Hkv, G * Np, D)
    kh = k.transpose(0, 2, 1, 3)  # [B, Hkv, Np, D]
    vh = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(_attn_kernel_grouped, scale=scale, n_valid=N)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G * Np, D), q.dtype),
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, G * Np, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G * Np, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * G * Np * Np * D,
            bytes_accessed=(G * Np * D * 2) * 2 + 2 * Np * D * 2,
            transcendentals=G * Np * Np,
        ),
        interpret=interpret,
    )(qh, kh, vh)
    # [B, Hkv, G*Np, D] -> [B, Np, Hq, D]
    out = out.reshape(B, Hkv, G, Np, D).transpose(0, 3, 1, 2, 4)
    out = out.reshape(B, Np, Hq, D)
    return out[:, :N] if Np != N else out
