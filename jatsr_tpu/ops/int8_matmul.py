"""Pallas W8A8 int8 matmul kernels for TPU serving.

TPU v5e's MXU multiplies int8 x int8 -> int32 at ~2x the bf16 FLOP rate.
XLA's own s8xs8 ``dot_general`` also reaches that rate (tools/mxu_bench.py:
257-332 TF/s), so the plain ``int8_matmul`` kernel is an alternative, not a
requirement.  The differentiator is ``int8_matmul_fused``: dynamic per-row
activation quantisation INSIDE the kernel — activations cross HBM once as
bf16 instead of bf16-read + int8-write + int8-read, and the fp32 rescale is
fused into the output tile write.

Used by ``ops.quant.int8_dot_general`` (serving mode of the big DiT
projections, ``ModelConfig.matmul_precision="int8"``).  The reference has
no quantized path at all — this is TPU-only headroom on top of parity
(ref workload: infer_test_v3m2.py:107-185).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Multiply by the reciprocal instead of dividing by 127: XLA strength-
# reduces constant division to a reciprocal multiply in SOME paths (one
# extra rounding), so an explicit multiply is the only way the Pallas and
# XLA quantisation paths produce bit-identical scales.  Computed with
# numpy, NOT jnp: this module is lazily imported from inside traced model
# code, and under an active trace a module-level jnp op is STAGED into
# the trace (omnistaging), so float() on it raises ConcretizationError.
_INV127 = float(np.float32(1.0) / np.float32(127.0))


def quantize_rows(x: jax.Array, eps: float = 1e-12):
    """Symmetric per-row absmax int8 quantisation of ``x [M, K]``.

    Returns ``(x_q int8 [M, K], scale fp32 [M, 1])``.  Elementwise + one
    row reduce — XLA fuses this into the producer; a Pallas kernel would
    not beat it.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) * _INV127
    x_q = jnp.round(xf / jnp.maximum(scale, eps)).astype(jnp.int8)
    return x_q, scale


def quantize_cols(w: jax.Array, eps: float = 1e-12):
    """Symmetric per-output-channel absmax int8 quantisation of ``w [K, N]``.

    Returns ``(w_q int8 [K, N], scale fp32 [1, N])``.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) * _INV127
    w_q = jnp.round(wf / jnp.maximum(scale, eps)).astype(jnp.int8)
    return w_q, scale


def _kernel(a_ref, w_ref, as_ref, ws_ref, out_ref):
    acc = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (
        acc.astype(jnp.float32) * as_ref[:] * ws_ref[:]
    ).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_bn(N: int, target: int) -> int:
    """Largest lane-aligned block <= target that divides N exactly — the
    grid is N // bn programs, so a non-divisor silently leaves tail
    columns of the output unwritten (observed as NaN garbage on chip)."""
    for bn in (1024, 512, 384, 256, 128):
        if bn <= target and N % bn == 0:
            return bn
    return N  # N < 128 is rejected by the caller's alignment assert


def _fused_kernel(a_ref, w_ref, ws_ref, out_ref):
    # Quantize the A row-block in-register per grid step.  (A scratch-
    # cached variant guarded by pl.when(j==0) produced NaNs on real
    # hardware — interpret mode does not model Mosaic's scratch/tiling
    # behaviour for (bm, 1) VMEM buffers; the recompute is VPU work that
    # overlaps the MXU stream.)
    a = a_ref[:].astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(a), axis=1, keepdims=True) * _INV127, 1e-12
    )
    a_q = jnp.round(a / s).astype(jnp.int8)
    acc = jnp.dot(a_q, w_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * s * ws_ref[:]).astype(
        out_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "block_m", "block_n")
)
def int8_matmul_fused(
    a: jax.Array,         # [M, K] bf16/f32 activations (unquantized)
    w_q: jax.Array,       # [K, N] int8
    w_scale: jax.Array,   # [1, N] fp32
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_m: int = 0,
    block_n: int = 0,
) -> jax.Array:
    """W8A8 matmul with IN-KERNEL dynamic per-row activation quantisation.

    vs the two-stage path (XLA quantize pass + int8 dot), activations cross
    HBM once as bf16 (2 B/elem) instead of bf16-read + int8-write + int8-
    read (4 B/elem), and the quantise work runs once per (row-block) on the
    VPU while the MXU streams the j sweep.
    """
    M, K = a.shape
    K2, N = w_q.shape
    assert K == K2 and K % 128 == 0 and N % 128 == 0, (a.shape, w_q.shape)

    bm = block_m or (256 if K > 2560 else 512)
    if not block_m:
        # Prefer a slightly smaller row block that divides M exactly over
        # the tuned default plus a pad: at the bench-default B=12 the
        # out_proj M is 24*352 = 8448, which 512 does not divide — the
        # round-up to 8704 costs a pad op, a slice, and 3% dead rows every
        # layer (trace: 0.54 ms/step of pad alone).  Any 32-aligned block
        # >= 256 keeps the dot MXU-efficient at these K, so search every
        # 32-aligned candidate down from the tuned default (B=9 grouping
        # yields M = 18*352 = 6336, whose largest such divisor is 352 —
        # a fixed shortlist missed it).
        for cand in range(bm, 255, -32):
            if M % cand == 0:
                bm = cand
                break
    # Whole-N block when the weight fits VMEM comfortably (e.g. the
    # serving out_proj, 1280x1280 int8): one program per row block, the
    # weight resident across the grid — avoids re-streaming A per column
    # block.
    bn = block_n or (N if K * N <= (4 << 20)
                     else _pick_bn(N, 1024 if K <= 2560 else 512))
    assert N % bn == 0, (N, bn)
    bm = min(bm, _round_up(M, 32))
    Mp = _round_up(M, bm)
    if Mp != M:
        a = jnp.pad(a, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        _fused_kernel,
        grid=(Mp // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N * (Mp // bm) + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, w_q, w_scale)
    return out[:M] if Mp != M else out


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no TPU lowering for ``lax.erf``; this polynomial's error is
    two orders of magnitude below bf16 resolution, so the kernel still
    matches the unfused ``nn.gelu(approximate=False)`` path after the bf16
    round (tests/test_int8_matmul.py).
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(y, impl: str = "tanh"):
    """In-kernel GELU (``ModelConfig.gelu_impl``: "tanh" default, "erf"
    restores the exact erf form).

    The tanh approximation (max abs err ~1e-3, far below the serving
    path's int8 re-quantisation step) is one transcendental with NO
    per-element divide, vs A&S-erf's exp+divide: +14% END-TO-END sampler
    throughput (66.1 -> 75.2 audio-sec/s) because the fused MLP kernel is
    VPU-epilogue-bound.  Quality gate PASSED: LSD delta 0.00 dB, Mel L1
    delta <= 0.02 on the held-out eval (PERF.md round 2)."""
    if impl == "erf":
        return 0.5 * y * (1.0 + _erf(y * (1.0 / math.sqrt(2.0))))
    if impl == "sigmoid":
        # y * sigmoid(1.702 y): ~40% fewer VPU ops than the tanh form
        # (no cubic), but a much looser approximation (max abs err ~0.02
        # vs ~1e-3) — quality-gate before defaulting.
        return y * jax.nn.sigmoid(1.702 * y)
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))


def _dense_gelu_quant_kernel(a_ref, w_ref, ws_ref, b_ref, gq_ref, gs_ref,
                             *, gelu_impl: str, fast_epilogue: bool):
    """dot + dequant + bias + GELU + requant, single-shot.

    (A slab-pipelined variant — dot slab i+1 issued before slab i's GELU,
    two-phase full-row absmax — measured a wash on chip, 84.0 vs 84.2
    audio-sec/s: after the tanh + fp32-fast-epilogue changes the VPU
    epilogue is cheap enough that overlapping it with the MXU no longer
    pays; the simpler form is kept.)"""
    a = a_ref[:].astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(a), axis=1, keepdims=True) * _INV127, 1e-12
    )
    # (Rewriting these divides as per-row reciprocal multiplies measured
    # NO end-to-end change — Mosaic handles the row-broadcast divide well
    # — so the division form stays for exact bit-parity with the unfused
    # quantize_rows path.)
    a_q = jnp.round(a / s).astype(jnp.int8)
    acc = jnp.dot(a_q, w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * ws_ref[:] + b_ref[:]
    if not fast_epilogue:
        # fast_epilogue=False: bf16 round-trips at the points where the
        # unfused path has them (QuantDense emits bf16; nn.gelu consumes
        # it) — the bit-match-the-unfused-path mode.  The default keeps
        # the epilogue fp32 end-to-end: four fewer VPU convert passes
        # over [M, 4H], strictly higher precision, +1 audio-sec/s;
        # quality gate PASSED (PERF.md round 2).
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
        g = _gelu(y, gelu_impl).astype(jnp.bfloat16).astype(jnp.float32)
    else:
        g = _gelu(y, gelu_impl)
    gs = jnp.maximum(
        jnp.max(jnp.abs(g), axis=1, keepdims=True) * _INV127, 1e-12
    )
    gq_ref[:] = jnp.round(g / gs).astype(jnp.int8)
    gs_ref[:] = gs


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_m", "gelu_impl", "fast_epilogue"),
)
def int8_dense_gelu_quant(
    a: jax.Array,         # [M, K] bf16/f32 activations (unquantized)
    w_q: jax.Array,       # [K, N] int8
    w_scale: jax.Array,   # [1, N] fp32
    bias: jax.Array,      # [1, N] fp32
    *,
    interpret: bool = False,
    block_m: int = 0,
    gelu_impl: str = "tanh",
    fast_epilogue: bool = True,
):
    """Fused ``quantize(gelu(dequant(a @ w_q) + b))`` -> (int8 [M, N],
    fp32 row scales [M, 1]).

    The serving MLP's first half.  In the XLA path this is a kOutput
    matmul fusion whose dequant+bias+erf-GELU+absmax epilogue over
    [M, 4H] runs largely serial with the dot (profiled 580 us vs a
    ~220 us dot floor at v3 geometry, PERF.md round 2); here Mosaic
    software-pipelines the grid so program i's VPU epilogue overlaps
    program i+1's MXU dot, and the GELU output goes straight to int8 (no
    bf16 round-trip through HBM).  The emitted (values, scales) feed the
    second MLP dot directly.

    bf16 roundings are inserted where the unfused path has them, so
    outputs match QuantDense(gelu(QuantDense(x))) to bf16 tolerance.
    """
    M, K = a.shape
    K2, N = w_q.shape
    assert K == K2 and K % 128 == 0 and N % 128 == 0, (a.shape, w_q.shape)

    bm = block_m or 128  # VMEM: w 6.5 MB (v3) + 2x f32 [bm, N] buffers
    bm = min(bm, _round_up(M, 32))
    Mp = _round_up(M, bm)
    if Mp != M:
        a = jnp.pad(a, ((0, Mp - M), (0, 0)))

    g_q, g_s = pl.pallas_call(
        functools.partial(_dense_gelu_quant_kernel, gelu_impl=gelu_impl,
                          fast_epilogue=fast_epilogue),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, N), jnp.int8),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N,
            transcendentals=Mp * N,
        ),
        interpret=interpret,
    )(a, w_q, w_scale, bias)
    if Mp != M:
        g_q, g_s = g_q[:M], g_s[:M]
    return g_q, g_s


# ---------------------------------------------------------------------------
# Fused norm + AdaLN-modulate + quantize prologues (round 3)
# ---------------------------------------------------------------------------
#
# In the serving DiT block, every quantized projection's input is
# ``norm(x) * (1 + scale) + shift`` — an affine-free RMS/LayerNorm (NO
# parameters) followed by the per-sample AdaLN modulation.  XLA runs this
# as reduce + map fusions that read the [B, N, H] activation from HBM
# twice and write the quantized int8 copy back before the dot reads it
# again.  Folding the whole prologue into the dot kernel reads x ONCE:
# norm statistics, modulation, row absmax and int8 rounding are VPU work
# that overlaps the MXU stream.  Per layer this removes ~3 full activation
# HBM passes for each of the two branches.
#
# Grid is (batch, row-blocks-within-batch): the modulation is per-SAMPLE,
# so a row block must not span batch elements — which requires the padded
# patch count Np to split into 8-aligned blocks (``ModelConfig.align_n``
# provides Np=352 at production geometry; callers fall back to the
# unfused path otherwise).


def _norm_mod(x, scale, shift, *, norm: str, eps: float = 1e-6):
    """Affine-free RMS/LayerNorm + AdaLN modulate: x f32 [bn, H],
    scale/shift f32-but-bf16-valued [1, H] (one sample's modulation row).

    Statistics in f32; bf16 rounds inserted exactly where the XLA path has
    them (norm output and after each modulation op), so the downstream row
    absmax / int8 rounding is BIT-IDENTICAL to the unfused serving path —
    a fully-fp32 prologue shifts quantisation boundaries on absmax-tie
    rows (measured ~10% whole-row output deltas on a tiny model)."""
    def b16(v):
        return v.astype(jnp.bfloat16).astype(jnp.float32)

    if norm == "rms":
        ms = jnp.mean(x * x, axis=1, keepdims=True)
        xn = x * jax.lax.rsqrt(ms + eps)
    else:  # "layer"
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
        xn = (x - mu) * jax.lax.rsqrt(var + eps)
    y = b16(b16(xn) * b16(1.0 + scale))
    return b16(y + shift)


def _norm_mod_dot_kernel(x_ref, sc_ref, sh_ref, w_ref, ws_ref, b_ref,
                         out_ref, *, norm: str, n_rblocks: int = 1):
    """Row-sub-block software pipeline (see _norm_mod_gelu_kernel): with
    n_rblocks=2 the emission order is P0, D0, P1, D1, E0, E1, so block
    1's VPU prologue hides behind block 0's dot and block 0's dequant
    epilogue hides behind block 1's dot.  Bit-identical per row."""
    bn = x_ref.shape[1]
    rb = bn // n_rblocks

    def prologue(b):
        x = x_ref[0, b * rb:(b + 1) * rb, :].astype(jnp.float32)
        y = _norm_mod(x, sc_ref[0], sh_ref[0], norm=norm)
        s = jnp.maximum(
            jnp.max(jnp.abs(y), axis=1, keepdims=True) * _INV127, 1e-12
        )
        return jnp.round(y / s).astype(jnp.int8), s

    aq = [None] * n_rblocks
    ss = [None] * n_rblocks
    aq[0], ss[0] = prologue(0)
    acc_next = jnp.dot(aq[0], w_ref[:], preferred_element_type=jnp.int32)
    for b in range(n_rblocks):
        if b + 1 < n_rblocks:
            aq[b + 1], ss[b + 1] = prologue(b + 1)
        acc = acc_next
        if b + 1 < n_rblocks:
            acc_next = jnp.dot(aq[b + 1], w_ref[:],
                               preferred_element_type=jnp.int32)
        out_ref[0, b * rb:(b + 1) * rb, :] = (
            acc.astype(jnp.float32) * ss[b] * ws_ref[:] + b_ref[:]
        ).astype(out_ref.dtype)


def _pick_bn_rows(n_rows: int, target: int) -> int:
    """Largest 8-aligned divisor of ``n_rows`` <= target (0 if none)."""
    best = 0
    for bn in range(8, min(n_rows, target) + 1, 8):
        if n_rows % bn == 0:
            best = bn
    return best


def norm_mod_dot_supported(n_rows: int, h: int, n_out: int) -> bool:
    return (_pick_bn_rows(n_rows, 256) > 0 and h % 128 == 0
            and n_out % 128 == 0)


@functools.partial(
    jax.jit, static_argnames=("norm", "out_dtype", "interpret"))
def int8_norm_mod_dot(
    x: jax.Array,        # [B, Np, H] bf16/f32 RAW residual stream
    scale: jax.Array,    # [B, H] fp32 AdaLN scale (the "1 +" is internal)
    shift: jax.Array,    # [B, H] fp32 AdaLN shift
    w_q: jax.Array,      # [H, N] int8
    w_scale: jax.Array,  # [1, N] fp32
    bias: jax.Array,     # [1, N] fp32 (zeros when the projection has none)
    *,
    norm: str = "rms",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """``dequant(quant(norm_mod(x)) @ w_q) + bias`` -> [B, Np, N].

    One kernel for the serving attention branch's whole input path:
    affine-free norm -> AdaLN modulate -> dynamic per-row int8 quant ->
    int8 dot (the fused qkv projection).  x crosses HBM exactly once.
    The prologue runs in fp32 end-to-end (strictly more precise than the
    XLA path's bf16 intermediates — same rationale as fast_epilogue).
    """
    B, Np, H = x.shape
    H2, N = w_q.shape
    assert H == H2, (x.shape, w_q.shape)
    # Biggest row block that fits: the per-program dot's M axis IS the
    # row block, and an MXU-starved M=88 dot costs more than the fused
    # prologue saves (measured -3% end-to-end at v3 geometry with the
    # first 88-row cut).  Np=352 -> one 352-row program per batch elem.
    bn = _pick_bn_rows(Np, 384)
    assert bn and H % 128 == 0 and N % 128 == 0, (Np, H, N)
    # [B, 1, H]: Mosaic requires the trailing block dims be 8/128-aligned
    # OR equal to the array dims — a (1, H) block over [B, H] is neither.
    scale, shift = scale[:, None, :], shift[:, None, :]

    return pl.pallas_call(
        # n_rblocks=2 (176-row halves) measured 101.7 vs 102.3: splitting
        # the dot's M axis costs more MXU efficiency than the hidden
        # prologue/epilogue VPU saves.  Keep the whole-block schedule.
        functools.partial(_norm_mod_dot_kernel, norm=norm, n_rblocks=1),
        grid=(B, Np // bn),
        in_specs=[
            pl.BlockSpec((1, bn, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, N), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * H * N,
            bytes_accessed=B * Np * H * 2 + H * N + B * Np * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, scale, shift, w_q, w_scale, bias)


def _norm_mod_gelu_kernel(x_ref, sc_ref, sh_ref, w_ref, ws_ref, b_ref,
                          gq_ref, gs_ref, *, norm: str, gelu_impl: str,
                          n_slabs: int, n_rblocks: int = 1):
    """Two-level software pipeline (Mosaic emits compute in program
    order, so emission order IS the schedule):

    - N1 axis in ``n_slabs`` slabs: slab j+1's MXU dot is issued before
      slab j's VPU epilogue (dequant + bias + GELU), hiding the
      transcendentals behind the dot stream.
    - rows in ``n_rblocks`` sub-blocks: block b+1's PROLOGUE (norm +
      AdaLN modulate + row quant) is emitted right after block b's first
      dot, and block b's requant tail (full-width absmax + round —
      per-row, so it can't start before the last slab) lands after block
      b+1's first dot is issued.  Without this the prologue and tail are
      fully exposed VPU time at the start/end of every program.

    Per-row math is untouched — outputs are bit-identical for any
    (n_slabs, n_rblocks)."""
    n1 = w_ref.shape[1]
    slab = n1 // n_slabs
    bn = x_ref.shape[1]
    rb = bn // n_rblocks

    def prologue(b):
        x = x_ref[0, b * rb:(b + 1) * rb, :].astype(jnp.float32)
        y = _norm_mod(x, sc_ref[0], sh_ref[0], norm=norm)
        s = jnp.maximum(
            jnp.max(jnp.abs(y), axis=1, keepdims=True) * _INV127, 1e-12
        )
        return jnp.round(y / s).astype(jnp.int8), s

    aq = [None] * n_rblocks
    ss = [None] * n_rblocks

    def dot(b, j):
        sl = slice(j * slab, (j + 1) * slab)
        return jnp.dot(aq[b], w_ref[:, sl], preferred_element_type=jnp.int32)

    aq[0], ss[0] = prologue(0)
    acc_next = dot(0, 0)
    for b in range(n_rblocks):
        if b + 1 < n_rblocks:
            # overlaps dot(b, 0), which is already in flight
            aq[b + 1], ss[b + 1] = prologue(b + 1)
        parts = []
        for j in range(n_slabs):
            acc = acc_next
            if j + 1 < n_slabs:
                acc_next = dot(b, j + 1)
            elif b + 1 < n_rblocks:
                acc_next = dot(b + 1, 0)
            sl = slice(j * slab, (j + 1) * slab)
            # Slice the REFS, not a hoisted full-width load: Mosaic
            # rejects broadcasting a lane-sliced vector ("Invalid input
            # layout" on vector.broadcast of the [1, slab] piece); a
            # direct ref slice loads with a clean layout.
            z = acc.astype(jnp.float32) * ss[b] * ws_ref[:, sl] + b_ref[:, sl]
            parts.append(_gelu(z, gelu_impl))
        # NOTE (measured): computing per-slab row maxes inside the loop
        # LOSES ~0.8% end-to-end — the loop's VPU is already saturated by
        # the GELU epilogue; the tail is hidden behind dot(b+1, 0) instead.
        g = parts[0] if n_slabs == 1 else jnp.concatenate(parts, axis=1)
        gs = jnp.maximum(
            jnp.max(jnp.abs(g), axis=1, keepdims=True) * _INV127, 1e-12
        )
        gq_ref[0, b * rb:(b + 1) * rb, :] = jnp.round(g / gs).astype(jnp.int8)
        gs_ref[0, b * rb:(b + 1) * rb, :] = gs


@functools.partial(
    jax.jit, static_argnames=("norm", "gelu_impl", "interpret"))
def int8_norm_mod_dense_gelu_quant(
    x: jax.Array,        # [B, Np, H] bf16/f32 RAW residual stream
    scale: jax.Array,    # [B, H] fp32
    shift: jax.Array,    # [B, H] fp32
    w_q: jax.Array,      # [H, N1] int8
    w_scale: jax.Array,  # [1, N1] fp32
    bias: jax.Array,     # [1, N1] fp32
    *,
    norm: str = "rms",
    gelu_impl: str = "tanh",
    interpret: bool = False,
):
    """Serving MLP first half with the norm+modulate prologue fused in:
    ``quantize(gelu(dequant(quant(norm_mod(x)) @ w_q) + b))`` ->
    (int8 [B, Np, N1], fp32 row scales [B, Np, 1]).  The int8 output
    feeds the second MLP dot at rank 3.  fp32 epilogue (fast_epilogue
    semantics); VMEM bounds the row block to ~88 at v3 geometry."""
    B, Np, H = x.shape
    H2, N1 = w_q.shape
    assert H == H2, (x.shape, w_q.shape)
    # Two f32 [bn, N1] temporaries + the resident w (H*N1 int8) bound the
    # block; past that, prefer the bigger block for MXU occupancy (the
    # dot's M axis is the row block — see int8_norm_mod_dot).
    bn = _pick_bn_rows(Np, 192 if H * N1 >= 4 * 1024 * 1024 else 384)
    assert bn and H % 128 == 0 and N1 % 128 == 0, (Np, H, N1)
    scale, shift = scale[:, None, :], shift[:, None, :]  # see norm_mod_dot

    # 8 slabs measured a wash vs 4 (102.26 vs 102.29 end-to-end) — the
    # pipeline is epilogue-VPU-bound, not granularity-bound.
    n_slabs = next((k for k in (4, 2, 5, 1)
                    if N1 % k == 0 and (N1 // k) % 128 == 0), 1)
    # Row sub-blocks (block b+1's prologue / block b's requant tail
    # overlapping the dot stream) MEASURED A 2.8% LOSS here: the halved
    # M=88 slab dots starve the MXU by more than the hidden VPU saves
    # (same effect as the original 88-row-block prologue cut, -3%).
    # The machinery stays for other geometries; production uses 1.
    n_rblocks = 1
    return pl.pallas_call(
        functools.partial(_norm_mod_gelu_kernel, norm=norm,
                          gelu_impl=gelu_impl, n_slabs=n_slabs,
                          n_rblocks=n_rblocks),
        grid=(B, Np // bn),
        in_specs=[
            pl.BlockSpec((1, bn, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, N1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, N1), jnp.int8),
            jax.ShapeDtypeStruct((B, Np, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * H * N1,
            bytes_accessed=B * Np * H * 2 + H * N1 + B * Np * N1,
            transcendentals=B * Np * N1,
        ),
        interpret=interpret,
    )(x, scale, shift, w_q, w_scale, bias)


def _mlp_full_kernel(a_ref, w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref,
                     b2_ref, out_ref, *, n_slabs: int, gelu_impl: str):
    """Whole serving MLP in one program: quant(a) -> dot1 -> dequant+bias+
    GELU+requant -> dot2 -> dequant+bias.  The hidden activation g never
    touches HBM; the 4H dimension is processed in ``n_slabs`` static slabs
    so temporaries stay slab-sized (VMEM is the budget: both weight
    matrices stay resident, 13.1 MB at v3 geometry).

    Numerics: g's int8 scales are per-(row, slab) rather than per-row —
    finer-grained than the unfused path (strictly more precise), so this
    variant is quality-gated end-to-end instead of bit-compared
    (PERF.md round 2)."""
    a = a_ref[:].astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(a), axis=1, keepdims=True) * _INV127, 1e-12
    )
    # Per-row reciprocal once, per-element multiply (VPU divide is many
    # times a multiply's cost; the scales make this quality-equivalent).
    a_q = jnp.round(a * (1.0 / s)).astype(jnp.int8)
    n1 = w1_ref.shape[1]
    slab = n1 // n_slabs
    acc2 = jnp.zeros((a_ref.shape[0], w2_ref.shape[1]), jnp.float32)

    def dot1(i):
        sl = slice(i * slab, (i + 1) * slab)
        return jnp.dot(a_q, w1_ref[:, sl], preferred_element_type=jnp.int32)

    # Manual software pipeline: issue slab i+1's MXU dot before slab i's
    # VPU epilogue so the dots stream while GELU/requant runs.  (Mosaic
    # pipelines DMA across grid steps but emits compute in program order —
    # without this interleave the MXU idles during every epilogue, which
    # is exactly what the profiled two-stage path already suffered.)
    acc1_next = dot1(0)
    for i in range(n_slabs):
        acc1 = acc1_next
        if i + 1 < n_slabs:
            acc1_next = dot1(i + 1)
        sl = slice(i * slab, (i + 1) * slab)
        y = (acc1.astype(jnp.float32) * s * w1s_ref[:, sl]
             + b1_ref[:, sl]).astype(jnp.bfloat16).astype(jnp.float32)
        g = _gelu(y, gelu_impl).astype(jnp.bfloat16).astype(jnp.float32)
        gs = jnp.maximum(
            jnp.max(jnp.abs(g), axis=1, keepdims=True) * _INV127, 1e-12
        )
        g_q = jnp.round(g * (1.0 / gs)).astype(jnp.int8)
        p = jnp.dot(g_q, w2_ref[sl, :], preferred_element_type=jnp.int32)
        acc2 = acc2 + p.astype(jnp.float32) * gs
    out_ref[:] = (acc2 * w2s_ref[:] + b2_ref[:]).astype(out_ref.dtype)


def _pick_slabs(n1: int, target: int = 1280) -> int:
    """Smallest slab count whose slab size is <= target and lane-aligned."""
    for k in range(1, 64):
        if n1 % k == 0 and n1 // k <= target and (n1 // k) % 128 == 0:
            return k
    return 1


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_m", "gelu_impl")
)
def int8_mlp(
    a: jax.Array,          # [M, H] bf16/f32 activations (unquantized)
    w1_q: jax.Array,       # [H, N1] int8
    w1_scale: jax.Array,   # [1, N1] fp32
    b1: jax.Array,         # [1, N1] fp32
    w2_q: jax.Array,       # [N1, H2] int8
    w2_scale: jax.Array,   # [1, H2] fp32
    b2: jax.Array,         # [1, H2] fp32
    *,
    interpret: bool = False,
    block_m: int = 0,
    gelu_impl: str = "tanh",
) -> jax.Array:
    """Full fused serving MLP: ``dequant(quant(gelu(a@w1+b1))@w2)+b2``.

    Returns [M, H2] bf16.  See ``_mlp_full_kernel`` for the VMEM layout
    and the per-(row, slab) quantisation note."""
    M, K = a.shape
    K2, N1 = w1_q.shape
    N1b, H2 = w2_q.shape
    assert K == K2 and N1 == N1b, (a.shape, w1_q.shape, w2_q.shape)
    assert K % 128 == 0 and N1 % 128 == 0 and H2 % 128 == 0

    bm = block_m or 128
    bm = min(bm, _round_up(M, 32))
    Mp = _round_up(M, bm)
    if Mp != M:
        a = jnp.pad(a, ((0, Mp - M), (0, 0)))
    n_slabs = _pick_slabs(N1)

    out = pl.pallas_call(
        functools.partial(_mlp_full_kernel, n_slabs=n_slabs,
                          gelu_impl=gelu_impl),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N1, H2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, H2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, H2), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N1 * (K + H2),
            bytes_accessed=Mp * K * 2 + K * N1 + N1 * H2 + Mp * H2 * 2,
            transcendentals=Mp * N1,
        ),
        interpret=interpret,
    )(a, w1_q, w1_scale, b1, w2_q, w2_scale, b2)
    return out[:M] if Mp != M else out


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "block_m", "block_n")
)
def int8_matmul(
    a_q: jax.Array,       # [M, K] int8
    a_scale: jax.Array,   # [M, 1] fp32
    w_q: jax.Array,       # [K, N] int8
    w_scale: jax.Array,   # [1, N] fp32
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_m: int = 0,
    block_n: int = 0,
) -> jax.Array:
    """``(a_q * a_scale) @ (w_q * w_scale)`` -> ``[M, N] out_dtype``.

    Full-K blocks (K always fits VMEM at DiT geometries, max 8192 int8
    columns); grid over (M, N) tiles with the j axis fastest so the A tile
    is loaded once per row sweep.
    """
    M, K = a_q.shape
    K2, N = w_q.shape
    assert K == K2, (a_q.shape, w_q.shape)
    assert K % 128 == 0 and N % 128 == 0, (
        f"K={K}, N={N} must be lane-aligned (x128)"
    )

    # Tile choice (tools/mxu_bench.py --sweep on v5e): bm=512 with the
    # widest bn that keeps (A + W) tiles ~<= 3 MB — wide bn amortises the
    # A-tile residency, bm=512 halves repeated W sweeps vs 256.
    bm = block_m or (256 if K > 5120 else 512)
    bn = block_n or _pick_bn(N, 1024 if K <= 2560 else 512)
    assert N % bn == 0, (N, bn)
    bm = min(bm, _round_up(M, 32))
    Mp = _round_up(M, bm)
    if Mp != M:
        a_q = jnp.pad(a_q, ((0, Mp - M), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, Mp - M), (0, 0)),
                          constant_values=1.0)

    out = pl.pallas_call(
        _kernel,
        grid=(Mp // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K + K * N * (Mp // bm) + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_q, w_q, a_scale, w_scale)
    return out[:M] if Mp != M else out
