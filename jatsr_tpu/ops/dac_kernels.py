"""Fused DAC residual-unit kernel — Pallas TPU.

XLA lowers the DAC decoder's small-channel tail convs (C <= 384 at
T ~ 10^5-10^6 after upsampling) with channels-major (T-minor) layouts,
materialised im2col windows ([K, T, C] copies) and whole-tensor relayout
reshapes between stages — profiled at most of the 266 ms/32 s decode
device time (PERF.md round 3; ref decode workload infer_test_v3m2.py:
409-418).  A pure-JAX tap-dot rewrite measured 2x WORSE because the
surrounding ops keep the T-minor layout and every dot pays a relayout.

This kernel fuses one whole residual unit — snake -> 7-tap dilated conv
-> snake -> 1x1 conv -> residual add (model.py:_res_unit, mirroring the
reference dac package's ResidualUnit) — into one pass over the
activation in its NATURAL row-major [T, C] layout:

- the [Tblk + 6*dilation, C] halo window is DMA'd from HBM once per
  program (no im2col materialisation: the 7 taps are static row-offset
  views of the window in VMEM),
- each tap is a [Tblk, C] x [C, C] MXU dot accumulated in fp32 (inputs
  cast to bf16 — the same precision class as XLA's DEFAULT-precision
  conv lowering of fp32 convs),
- both snakes and the residual add ride the VPU between the dots, so
  the activation crosses HBM exactly twice (in + out) per unit instead
  of >= 6 times.

Weights stay resident in VMEM across the T grid (7*C^2 + C^2 bf16 --
2.4 MB at the largest eligible C=384).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-stage row-block size: keeps window + weights + output well inside
# VMEM (~16 MB/core) at every eligible channel width (the input window is
# double-buffered, the output block is pipelined by Mosaic).
_ROWS_BUDGET = 245760  # tblk * C target (294912 OOM'd VMEM by 36K at C=256)

# Non-TPU backends can only run these kernels under Mosaic interpret
# mode, which is orders of magnitude slower than XLA's conv path — far
# too slow for a decode that is now the serving DEFAULT.  The model
# dispatch (models/dac/model.py) therefore falls back to the plain conv
# path off-TPU unless a test flips this to exercise interpret-mode
# parity of the full decoder dispatch.
ALLOW_INTERPRET_DISPATCH = False


def _tblk_for(c: int) -> int:
    if c >= 768:
        # Decoder stage 0's C=768 units: the resident weights alone hold
        # 9.4 MB of VMEM (7*C^2 + C^2 bf16), so only a small row block
        # fits beside them (window + double-buffered out ~= 3 MB at 128).
        return 128
    t = max(512, _ROWS_BUDGET // c)
    return (t // 8) * 8


def res_unit_supported(c: int, t: int, dilation: int) -> bool:
    """Eligibility: channel widths where XLA's conv lowering loses, and
    sequences long enough to fill at least one row block.  C=768 measured
    8x SLOWER than XLA's conv here (r5, reports/r5/c768_validate.json:
    51.2 vs 6.3 ms/unit at T=23072 — the 9.4 MB resident weights force a
    128-row block that starves the MXU, while XLA's fp32 conv at C=768 is
    already near its dot floor), so the gate stays at the small-channel
    widths where the kernel wins."""
    cp = -(-c // 128) * 128
    return c <= 384 and t >= _tblk_for(cp) + 6 * dilation


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _snake(x, a):
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * x))


# Snake transcendental width for the DOT-FEEDING activations: the sin
# output is immediately cast to bf16 for the tap dots, and the VPU runs
# transcendentals at the half-width double rate (same lever as the
# attention kernel's bf16 exp2 — ops/attention.py) — so computing the
# snake in bf16 loses nothing the bf16 cast wasn't already losing, at
# ~2x the VPU rate.  fp32 default (bit-parity with the composition
# tests); flipped by the serving knob after its decoded-metric gate.
SNAKE_COMPUTE_DTYPE = jnp.float32


def _snake_b16(x, a):
    """snake -> bf16, transcendentals in SNAKE_COMPUTE_DTYPE."""
    dt = SNAKE_COMPUTE_DTYPE
    return _snake(x.astype(dt), a.astype(dt)).astype(jnp.bfloat16)


def set_snake_compute_dtype(name: str) -> None:
    """Serving knob: "float32" (default) or "bfloat16".  Must be called
    BEFORE the first decode trace — the jitted kernels capture the global
    at trace time and jax's cache key does not include it (tools that
    A/B both settings in one process must jax.clear_caches() between)."""
    global SNAKE_COMPUTE_DTYPE
    SNAKE_COMPUTE_DTYPE = {"float32": jnp.float32,
                           "bfloat16": jnp.bfloat16}[name]


def _res_unit_kernel(x_hbm, w7_ref, b7_ref, w1_ref, b1_ref, a1_ref, a2_ref,
                     o_ref, xwin, sem, *, tblk: int, d: int, w8: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    n = pl.num_programs(1)
    lin = b * n + i  # linear program index over the whole (B, nblk) grid

    # Double-buffered halo-window DMA: the next program's copy is issued
    # before this program's compute, so the HBM read rides under the
    # MXU/VPU work (the single-buffer form measured DMA-latency-bound).
    # The pipeline runs across the batch boundary too (the last block of
    # element b prefetches block 0 of element b+1).  DMA slice sizes must
    # be sublane-aligned, so the window is rounded up to w8; rows past
    # tblk + 6d are junk and never read by the taps below.
    def dma(bb, j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(j * tblk, w8), :], xwin.at[slot], sem.at[slot]
        )

    @pl.when(lin == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(b, i + 1, (lin + 1) % 2).start()

    @pl.when((i + 1 == n) & (b + 1 < nb))
    def _():
        dma(b + 1, 0, (lin + 1) % 2).start()

    dma(b, i, lin % 2).wait()
    x = xwin[lin % 2]  # [w8, C] fp32 (includes the 3d zero-pad margins)
    a1 = a1_ref[:]
    # snake(0) == 0, so the zero-pad margins stay exact conv padding.
    y = _snake_b16(x, a1)

    acc = jnp.dot(y[:tblk], w7_ref[0],
                  preferred_element_type=jnp.float32)
    for k in range(1, 7):
        acc = acc + jnp.dot(y[k * d: k * d + tblk], w7_ref[k],
                            preferred_element_type=jnp.float32)
    y2 = _snake_b16(acc + b7_ref[:], a2_ref[:])
    y3 = jnp.dot(y2, w1_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = x[3 * d: 3 * d + tblk] + y3 + b1_ref[:]


# ---------------------------------------------------------------------------
# Stage-fused variant: all three residual units of a decoder stage chained
# inside ONE kernel pass
# ---------------------------------------------------------------------------
#
# The decoder runs 3 residual units (dilations 1, 3, 9) back-to-back per
# upsample stage (model.py:decoder_forward, mirroring the reference dac
# package).  Per-unit kernels cost 2 HBM round-trips each (6 per stage)
# plus a whole-tensor jnp.pad and [:t, :c] slice per call — profiled at
# ~13% of decode on top of the kernels themselves (PERF.md round 4).
# Chaining the units inside one program makes the stage's activation cross
# HBM exactly twice total.  Each block recomputes the halo region of its
# neighbours from the raw input (margins 3*(1+3+9) = 39 rows per side —
# ~4-8% redundant compute at the tuned block sizes), so block outputs are
# bit-identical to the unit-by-unit composition.

_STAGE_MARGIN = 39  # 3*d summed over the stage's dilations (1, 3, 9)


def _stage_tblk(cp: int) -> int:
    # Per-channel-width block rows: weights for 3 units (3*8*cp^2 bf16)
    # plus double-buffered [w8, cp] fp32 windows and transient unit
    # intermediates must stay inside ~12 MB of VMEM.
    return {128: 1920, 256: 960, 384: 384}.get(cp, max(256, 245760 // cp))


def res_stage_supported(c: int, t: int) -> bool:
    cp = -(-c // 128) * 128
    return c <= 384 and t >= _stage_tblk(cp) + 2 * _STAGE_MARGIN


def _res_stage_kernel(x_hbm, w7s, b7s, w1s, b1s, a1s, a2s, o_ref, xwin, sem,
                      *, tblk: int, dils, w8: int, t: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    n = pl.num_programs(1)
    lin = b * n + i

    def dma(bb, j, slot):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(j * tblk, w8), :], xwin.at[slot], sem.at[slot]
        )

    @pl.when(lin == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(b, i + 1, (lin + 1) % 2).start()

    @pl.when((i + 1 == n) & (b + 1 < nb))
    def _():
        dma(b + 1, 0, (lin + 1) % 2).start()

    dma(b, i, lin % 2).wait()
    x = xwin[lin % 2]  # [w8, C] fp32, margins included
    # Valid-length bookkeeping: rows beyond tblk + 2*_STAGE_MARGIN are
    # sublane-round junk, consumed by no tap below.
    length = tblk + 2 * _STAGE_MARGIN
    off = 0
    for u, d in enumerate(dils):
        if u:
            # Each unit's TRUE input is zero-padded outside [0, t): rows of
            # the recomputed halo that fall outside the sequence hold
            # f_prev(0) != 0 (the previous unit's bias response), so they
            # must be re-zeroed before feeding this unit's taps — otherwise
            # the first/last blocks diverge from the per-unit composition.
            g0 = i * tblk - _STAGE_MARGIN + off
            gidx = jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0) + g0
            x = jnp.where((gidx >= 0) & (gidx < t), x, 0.0)
        out_len = length - 6 * d
        y = _snake_b16(x, a1s[u:u + 1])
        acc = jnp.dot(y[:out_len], w7s[u, 0],
                      preferred_element_type=jnp.float32)
        for k in range(1, 7):
            acc = acc + jnp.dot(y[k * d: k * d + out_len], w7s[u, k],
                                preferred_element_type=jnp.float32)
        y2 = _snake_b16(acc + b7s[u:u + 1], a2s[u:u + 1])
        y3 = jnp.dot(y2, w1s[u], preferred_element_type=jnp.float32)
        x = x[3 * d: 3 * d + out_len] + y3 + b1s[u:u + 1]
        length = out_len
        off += 3 * d
    o_ref[0] = x[:tblk]


@functools.partial(jax.jit, static_argnames=("dilations", "interpret"))
def res_stage_fused(x: jax.Array, w7s: jax.Array, b7s: jax.Array,
                    w1s: jax.Array, b1s: jax.Array,
                    alpha1s: jax.Array, alpha2s: jax.Array,
                    dilations: tuple = (1, 3, 9),
                    interpret: bool = False) -> jax.Array:
    """Three chained residual units (one decoder stage) in one kernel.

    Args:
        x: [T, C] or [B, T, C] fp32 activation.
        w7s: [3, 7, C, C] stacked dilated-conv kernels, b7s: [3, C].
        w1s: [3, C, C] stacked 1x1 kernels, b1s: [3, C].
        alpha1s/alpha2s: [3, C] snake parameters.
    Returns:
        same shape as x, fp32 — bit-identical to composing
        :func:`res_unit_fused` over the three units.
    """
    assert tuple(dilations) == (1, 3, 9), dilations
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    nb, t, c = x.shape
    cp = -(-c // 128) * 128
    if cp != c:
        e = cp - c
        x = jnp.pad(x, ((0, 0), (0, 0), (0, e)))
        w7s = jnp.pad(w7s, ((0, 0), (0, 0), (0, e), (0, e)))
        w1s = jnp.pad(w1s, ((0, 0), (0, e), (0, e)))
        b7s = jnp.pad(b7s, ((0, 0), (0, e)))
        b1s = jnp.pad(b1s, ((0, 0), (0, e)))
        alpha1s = jnp.pad(alpha1s, ((0, 0), (0, e)), constant_values=1.0)
        alpha2s = jnp.pad(alpha2s, ((0, 0), (0, e)), constant_values=1.0)
    tblk = _stage_tblk(cp)
    w8 = -(-(tblk + 2 * _STAGE_MARGIN) // 8) * 8
    nblk = -(-t // tblk)
    xp = jnp.pad(
        x,
        ((0, 0),
         (_STAGE_MARGIN, (nblk - 1) * tblk + w8 - t - _STAGE_MARGIN),
         (0, 0)),
    )

    row3 = lambda v: v.astype(jnp.float32)  # [3, cp] rows, sliced per unit
    kernel = functools.partial(_res_stage_kernel, tblk=tblk,
                               dils=tuple(dilations), w8=w8, t=t)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nblk * tblk, cp), jnp.float32),
        grid=(nb, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((3, 7, cp, cp), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp, cp), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tblk, cp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w8, cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 8 * nb * t * c * c,
            bytes_accessed=2 * nb * t * c * 4,
            transcendentals=6 * nb * t * c,
        ),
        interpret=interpret,
    )(xp, w7s.astype(jnp.bfloat16), row3(b7s),
      w1s.astype(jnp.bfloat16), row3(b1s), row3(alpha1s), row3(alpha2s))
    out = out[:, :t, :c]
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def res_unit_fused(x: jax.Array, w7: jax.Array, b7: jax.Array,
                   w1: jax.Array, b1: jax.Array,
                   alpha1: jax.Array, alpha2: jax.Array,
                   dilation: int, interpret: bool = False) -> jax.Array:
    """Fused snake -> conv7(dilated, pad 3d) -> snake -> conv1x1 -> +x.

    Args:
        x: [T, C] or [B, T, C] fp32 activation.  The batch dim rides the
           Pallas grid — one pallas_call regardless of B (ADVICE r3).
        w7: [7, C, C] conv kernel (WIO), b7: [C].
        w1: [1, C, C] or [C, C] 1x1 kernel, b1: [C].
        alpha1/alpha2: [C] snake parameters.
    Returns:
        same shape as x, fp32, identical math to model._res_unit.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    nb, t, c = x.shape
    d = dilation
    # Mosaic HBM DMA slices need a 128-aligned lane dim: pad channels up
    # (exact — zero input lanes stay zero through snake(0)=0 and the
    # zero-padded weight rows/columns) and slice the output back.
    cp = -(-c // 128) * 128
    w1m = w1.reshape(c, c) if w1.ndim == 3 else w1
    if cp != c:
        e = cp - c
        x = jnp.pad(x, ((0, 0), (0, 0), (0, e)))
        w7 = jnp.pad(w7, ((0, 0), (0, e), (0, e)))
        w1m = jnp.pad(w1m, ((0, e), (0, e)))
        b7 = jnp.pad(b7, (0, e))
        b1 = jnp.pad(b1, (0, e))
        alpha1 = jnp.pad(alpha1, (0, e), constant_values=1.0)
        alpha2 = jnp.pad(alpha2, (0, e), constant_values=1.0)
    tblk = _tblk_for(cp)
    # Halo window rounded up to a sublane multiple (Mosaic DMA slices
    # must be 8-row aligned); the tail is padded so the last block's
    # window stays in bounds.
    w8 = -(-(tblk + 6 * d) // 8) * 8
    nblk = -(-t // tblk)
    xp = jnp.pad(
        x, ((0, 0), (3 * d, (nblk - 1) * tblk + w8 - t - 3 * d), (0, 0))
    )

    w7b = w7.astype(jnp.bfloat16)
    w1b = w1m.astype(jnp.bfloat16)
    row = lambda v: v.reshape(1, cp).astype(jnp.float32)

    kernel = functools.partial(_res_unit_kernel, tblk=tblk, d=d, w8=w8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nblk * tblk, cp), jnp.float32),
        grid=(nb, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((7, cp, cp), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tblk, cp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w8, cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * nb * t * c * c,
            bytes_accessed=2 * nb * t * c * 4,
            transcendentals=2 * nb * t * c,
        ),
        interpret=interpret,
    )(xp, w7b, row(b7), w1b, row(b1), row(alpha1), row(alpha2))
    out = out[:, :t, :c]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Fused snake -> conv_transpose (polyphase) for the decoder upsample stages.
#
# XLA lowers conv1d_transpose (models/dac/layers.py:conv1d_transpose) as a
# conv over the stride-dilated input: the multiply-add fusions stream a
# zero-stuffed [T*s, Cin] tensor per tap — profiled at ~42% of the fused
# decode's device time (PERF.md round 4), almost all of it HBM traffic over
# zeros.  Polyphase decomposition kills the zero-stuffing: with K = 2s taps
# (every DAC stage), output index m = t*s - pad + k receives EXACTLY two
# taps, k = p and k = p + s where p = (m + pad) % s, t = (m + pad) // s.
# Defining the un-shifted "flat" sequence
#
#     flat[t*s + p] = snake(x[t]) @ w[p]  +  snake(x[t-1]) @ w[p + s]
#
# the true output is out[m] = flat[m + pad] + bias (a row slice).  Packing
# the s phase results as column blocks of one [Tblk, s*Cout] tile makes the
# row-major reshape [T, s*Cout] -> [T*s, Cout] FREE, and the whole stage
# becomes two resident-weight MXU dots per row block:
#
#     flat_tile = snake(x_blk) @ Wp  +  snake(x_shift_blk) @ Ws
#
# with Wp[c, p*Cout+o] = w[p, c, o], Ws likewise for taps s..2s-1, and
# x_shift the one-row-right-shifted input (materialised once in XLA — one
# [T, Cin] copy instead of per-tap dilated streams).  The snake activation
# rides the VPU in front of each dot, so the stage reads the activation
# from HBM twice and writes flat once.  Ref decode workload:
# infer_test_v3m2.py:409-418.
_TBLK_TR = {768: 96, 384: 256, 192: 512}  # per-Cin row block (VMEM budget)

# Phase-STREAMED row block for stages whose full polyphase weight pack
# exceeds VMEM (decoder stage 0: Cin=1536, s=8 -> 2 x [1536, 8*768] bf16
# = 37.7 MB resident).  The streamed variant grids over phases with the
# phase pair's [Cin, Cout] weights as a blocked operand (4 x 2.25 MB
# double-buffered) and the pre-snaked activation re-streamed once per
# phase (bf16, so s passes cost ~s * 2*T*Cin*2 bytes — ~135 MB at stage-0
# geometry, ~0.2 ms of HBM time vs the MXU's ~0.5 ms of dots).
_TBLK_TR_STREAM = 160


def conv_transpose_supported(c_in: int, c_out: int, stride: int,
                             k: int, t: int) -> bool:
    """Stages where a polyphase kernel engages: K=2s (all DAC stages) and
    T fills a row block.  Cin <= 768 takes the resident-weight kernel;
    larger Cin (stage 0's 1536) the phase-streamed one."""
    if k != 2 * stride:
        return False
    if c_in in _TBLK_TR:
        return t >= _TBLK_TR[c_in]
    return c_in % 128 == 0 and t >= _TBLK_TR_STREAM


def _snake_tr_kernel(x_ref, xs_ref, wp_ref, ws_ref, a_ref, b_ref, o_ref):
    a = a_ref[0]
    y = _snake_b16(x_ref[0].astype(jnp.float32), a)
    yp = _snake_b16(xs_ref[0].astype(jnp.float32), a)
    acc = jnp.dot(y, wp_ref[...], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(yp, ws_ref[...],
                        preferred_element_type=jnp.float32)
    o_ref[0] = acc + b_ref[0]


def _snake_tr_stream_kernel(y_ref, ys_ref, wp_ref, ws_ref, b_ref, o_ref):
    # Phase-streamed: activations arrive PRE-snaked (bf16) because every
    # phase re-reads them — snaking in-kernel would redo the tanh/sin
    # transcendentals s times.  One phase's two taps per program.
    acc = jnp.dot(y_ref[0], wp_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(ys_ref[0], ws_ref[0],
                        preferred_element_type=jnp.float32)
    o_ref[0] = acc + b_ref[0]


@functools.partial(jax.jit,
                   static_argnames=("stride", "padding", "output_padding",
                                    "interpret"))
def snake_conv_transpose_fused(x, w, b, alpha, *, stride: int,
                               padding: int, output_padding: int = 0,
                               interpret: bool = False):
    """snake(x) -> conv_transpose in one Pallas pass.

    Args:
        x: [B, T, Cin] fp32 (or [T, Cin]).
        w: [K, Cin, Cout] transpose-conv weights (K = 2*stride).
        b: [Cout] bias.  alpha: [Cin] snake parameter.
    Returns [B, (T-1)*stride - 2*padding + K + output_padding, Cout].
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    bsz, t, ci = x.shape
    k, _, co = w.shape
    s = stride
    assert k == 2 * s, (k, s)
    if ci not in _TBLK_TR:
        out = _snake_conv_transpose_streamed(
            x, w, b, alpha, stride=stride, padding=padding,
            output_padding=output_padding, interpret=interpret)
        return out[0] if squeeze else out
    tblk = _TBLK_TR[ci]
    cop = _round_up(co, 128)
    m_out = (t - 1) * s - 2 * padding + k + output_padding

    # One-row-right shift (x_shift[t] = x[t-1], x_shift[0] = 0): a single
    # XLA copy of the activation replaces the per-tap dilated streams.
    # Both operands carry t+1 meaningful rows — flat[t*s + p] still takes
    # x[t-1] @ w[p+s] (the final partial output window) even though x[t]
    # itself is past the sequence.
    xs = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
    tp = _round_up(t + 1, tblk)
    # snake(0) = 0, so zero-padded rows produce flat rows that the final
    # slice drops (or, for row t, contribute exactly the true boundary).
    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    xs = jnp.pad(xs, ((0, 0), (0, tp - t - 1), (0, 0)))
    nblk = tp // tblk

    # Wp[c, p*cop + o] = w[p, c, o]; Ws from taps s..2s-1.  Zero-padded
    # output channels are exact (sliced away after the flat reshape).
    wpad = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, cop - co)))
    wp = wpad[:s].transpose(1, 0, 2).reshape(ci, s * cop)
    ws = wpad[s:].transpose(1, 0, 2).reshape(ci, s * cop)
    brow = jnp.tile(jnp.pad(b.astype(jnp.float32), (0, cop - co)), (s,))

    flat = pl.pallas_call(
        _snake_tr_kernel,
        grid=(bsz, nblk),
        in_specs=[
            pl.BlockSpec((1, tblk, ci), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tblk, ci), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, s * cop), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, s * cop), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s * cop), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tblk, s * cop), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, s * cop), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * tp * ci * s * cop,
            bytes_accessed=bsz * tp * (2 * ci + s * cop) * 4,
            transcendentals=2 * bsz * tp * ci,
        ),
        interpret=interpret,
    )(x, xs, wp, ws, alpha.astype(jnp.float32)[None], brow[None])

    # Free reshape ([tp, s*cop] rows are already (t, p)-major), then one
    # slice applies the -pad row shift and drops channel padding.
    flat = flat.reshape(bsz, tp * s, cop)
    out = jax.lax.dynamic_slice(
        flat, (0, padding, 0), (bsz, m_out, cop))[..., :co]
    return out[0] if squeeze else out


def _snake_conv_transpose_streamed(x, w, b, alpha, *, stride: int,
                                   padding: int, output_padding: int,
                                   interpret: bool):
    """Phase-streamed polyphase transpose for stages whose full weight
    pack exceeds VMEM (decoder stage 0: Cin=1536, s=8).

    Same math as the resident kernel — flat[t*s + p] = snake(x[t]) @ w[p]
    + snake(x[t-1]) @ w[p+s] — but the grid runs (batch, phase, row-block)
    with ONE phase pair's [Cin, Cout] weights as a blocked operand, so
    VMEM holds ~2 x 2.25 MB of weights instead of 2 x 18.9 MB.  Phases
    are the outer grid axis: weights are fetched once per phase while the
    pre-snaked bf16 activation re-streams per phase (s * ~17 MB — cheaper
    than streaming zero-stuffed fp32 taps, which is what XLA's dilated
    lowering does).  snake() is computed ONCE by XLA up front (fp32, then
    cast) because an in-kernel snake would redo the transcendentals per
    phase."""
    bsz, t, ci = x.shape
    k, _, co = w.shape
    s = stride
    tblk = _TBLK_TR_STREAM
    m_out = (t - 1) * s - 2 * padding + k + output_padding

    y = _snake_b16(x.astype(jnp.float32), alpha)
    ys = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))  # ys[t] = snake(x[t-1])
    tp = _round_up(t + 1, tblk)
    y = jnp.pad(y, ((0, 0), (0, tp - t), (0, 0)))
    ys = jnp.pad(ys, ((0, 0), (0, tp - t - 1), (0, 0)))
    nblk = tp // tblk

    cop = _round_up(co, 128)
    wb = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, cop - co)))
    wp = wb[:s]              # [s, ci, cop] — tap p
    ws = wb[s:]              # [s, ci, cop] — tap p + s
    brow = jnp.pad(b.astype(jnp.float32), (0, cop - co))[None]

    out4 = pl.pallas_call(
        _snake_tr_stream_kernel,
        grid=(bsz, s, nblk),
        in_specs=[
            pl.BlockSpec((1, tblk, ci), lambda bb, p, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tblk, ci), lambda bb, p, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci, cop), lambda bb, p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci, cop), lambda bb, p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cop), lambda bb, p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Phase p writes the p-th cop-wide column block of a [tp, s*cop]
        # row — a size-1 block on a length-s axis is not Mosaic-tileable,
        # so phases live on the lane axis (same packing as the resident
        # kernel) and the (t, p)-major reshape below stays free.
        out_specs=pl.BlockSpec((1, tblk, cop),
                               lambda bb, p, i: (bb, i, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, tp, s * cop), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * tp * s * ci * cop,
            bytes_accessed=bsz * s * tp * ci * 2 * 2
            + 2 * s * ci * cop * 2 + bsz * tp * s * cop * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, ys, wp, ws, brow)

    # [tp, s*cop] rows are (t, p)-major -> free reshape, shift, trim.
    flat = out4.reshape(bsz, tp * s, cop)
    return jax.lax.dynamic_slice(
        flat, (0, padding, 0), (bsz, m_out, cop))[..., :co]
