"""Ablation micro-bench for the fused DAC decoder stage kernels.

The round-5 decode per-op table (PERF.md) shows the three fused residual
stages at ~55% of decode device time, yet a first-principles floor (MXU
dots at the padded channel widths + 2 HBM crossings) predicts ~2-3x less.
This tool measures, per real stage geometry of a 32 s segment decode:

  1. the full res_stage_fused kernel,
  2. the same kernel with snake -> identity (isolates the sin/transcendental
     VPU cost — bitwise-different output, timing-only ablation),
  3. a pure [w8, cp] x [cp, cp] dot chain at the same block schedule
     (the MXU floor with the same DMA pattern),
  4. the XLA per-unit conv path at the SAME geometry (what the fallback
     costs — also covers the C=768 stage the fused kernel doesn't take),

plus the two polyphase upsample kernels.  Each timing is an amortized
in-loop measurement (one dispatch, scalar-fetch barrier) so the tunnel
latency doesn't pollute it.

Run on the real chip:  python tools/profile_res_stage.py [--seconds 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from jatsr_tpu.ops import dac_kernels as dk
from jatsr_tpu.utils.runtime import enable_compilation_cache


def _chain(fn, x, iters):
    """Amortized: iters data-dependent calls inside one jitted program."""

    @jax.jit
    def loop(x):
        def body(i, x0):
            out = fn(x0)
            # fold a scalar back in: data dependence defeats CSE
            return (x0 * 0.999
                    + 0.001 * jnp.mean(out).astype(x0.dtype)).astype(x0.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    # warmup barrier via SCALAR FETCH: block_until_ready can return before
    # remote execution completes under the tunnelled backend, which would
    # bill the warmup's real run to the first timed call (this produced a
    # phantom 9x outlier in validate_c768's first measurement, r5).
    float(loop(x).mean())
    t0 = time.perf_counter()
    r = float(loop(x).mean())
    dt = time.perf_counter() - t0
    assert r == r
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=32.0)
    ap.add_argument("--ctx", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", nargs="*", type=int, default=[0, 1, 2, 3])
    ap.add_argument("--snake-bf16", action="store_true",
                    help="run the snake transcendentals in bf16 (the VPU "
                         "half-width double-rate lever)")
    args = ap.parse_args()

    if args.snake_bf16:
        dk.set_snake_compute_dtype("bfloat16")
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    # Real decoder stage geometries for a 32 s + 2*ctx segment.
    t0f = int(args.seconds * 44100 / 512) + 2 * args.ctx
    rates = (8, 8, 4, 2)
    geoms = []  # (stage, T_in, Cin, Cout, stride)
    t, c = t0f, 1536
    for i, s in enumerate(rates):
        geoms.append((i, t, c, c // 2, s))
        t, c = t * s, c // 2

    results = {}
    for i, t_in, cin, cout, s in geoms:
        if i not in args.stages:
            continue
        key = jax.random.PRNGKey(i)
        t_up = (t_in - 1) * s - 2 * (-(-s // 2)) + 2 * s + (s % 2)
        row = {"T_in": t_in, "Cin": cin, "Cout": cout, "stride": s,
               "T_res": t_up}

        # --- upsample kernel (snake + polyphase conv-transpose) ---------
        x = jax.random.normal(key, (1, t_in, cin), jnp.float32)
        w = jax.random.normal(key, (2 * s, cin, cout), jnp.float32) * 0.02
        b = jnp.zeros((cout,), jnp.float32)
        al = jnp.ones((cin,), jnp.float32)
        if dk.conv_transpose_supported(cin, cout, s, 2 * s, t_in):
            fn = lambda xx: dk.snake_conv_transpose_fused(
                xx, w, b, al, stride=s, padding=-(-s // 2),
                output_padding=s % 2)
            row["upsample_ms"] = 1e3 * _chain(fn, x, args.iters)

        # --- res stage: full / no-snake / XLA fallback ------------------
        xr = jax.random.normal(key, (1, t_up, cout), jnp.float32)
        w7s = jax.random.normal(key, (3, 7, cout, cout), jnp.float32) * 0.02
        b7s = jnp.zeros((3, cout), jnp.float32)
        w1s = jax.random.normal(key, (3, cout, cout), jnp.float32) * 0.02
        b1s = jnp.zeros((3, cout), jnp.float32)
        a1s = jnp.ones((3, cout), jnp.float32)
        a2s = jnp.ones((3, cout), jnp.float32)

        if dk.res_stage_supported(cout, t_up):
            fn = lambda xx: dk.res_stage_fused(xx, w7s, b7s, w1s, b1s,
                                               a1s, a2s)
            row["res_stage_ms"] = 1e3 * _chain(fn, xr, args.iters)
        elif dk.res_unit_supported(cout, t_up, 9):
            # C=768: the per-unit kernel path (r5) — 3 chained units.
            def units(xx):
                for u in range(3):
                    xx = dk.res_unit_fused(
                        xx, w7s[u], b7s[u], w1s[u], b1s[u], a1s[u], a2s[u],
                        dilation=(1, 3, 9)[u])
                return xx
            row["res_units_ms"] = 1e3 * _chain(units, xr, args.iters)

            # snake -> identity ablation (timing only; retrace needed)
            real_snake = dk._snake
            try:
                dk._snake = lambda xx, aa: xx
                jax.clear_caches()
                row["res_stage_nosnake_ms"] = 1e3 * _chain(
                    fn, xr, args.iters)
            finally:
                dk._snake = real_snake
                jax.clear_caches()

        # XLA per-unit conv path at the same geometry (the C=768 stage's
        # production path; elsewhere, what the fallback would cost).
        from jatsr_tpu.models.dac.layers import conv1d
        from jatsr_tpu.models.dac.model import snake

        def xla_stage(xx):
            for u in range(3):
                d = (1, 3, 9)[u]
                y = snake(xx, a1s[u])
                y = conv1d(y, w7s[u], b7s[u], padding=3 * d, dilation=d)
                y = snake(y, a2s[u])
                y = conv1d(y, w1s[u][None], b1s[u])
                xx = xx + y
            return xx

        row["res_stage_xla_ms"] = 1e3 * _chain(
            jax.jit(xla_stage), xr, max(2, args.iters // 2))

        # MXU floor: same block schedule, dots only (24 dots of
        # [w8, cp] x [cp, cp] per block, no snake, no halo bookkeeping).
        cp = -(-cout // 128) * 128
        tblk = dk._stage_tblk(cp)
        w8 = -(-(tblk + 2 * dk._STAGE_MARGIN) // 8) * 8
        nblk = -(-t_up // tblk)
        a2d = jax.random.normal(key, (nblk * w8, cp), jnp.bfloat16)
        w2d = jax.random.normal(key, (24, cp, cp), jnp.bfloat16) * 0.02

        def dots_only(xx):
            acc = jnp.zeros((xx.shape[0], cp), jnp.float32)
            for u in range(24):
                acc = acc + jnp.dot(xx, w2d[u],
                                    preferred_element_type=jnp.float32)
            return acc

        row["dots_floor_ms"] = 1e3 * _chain(
            jax.jit(dots_only), a2d, max(2, args.iters // 2))
        results[f"stage_{i}"] = row
        print(json.dumps({f"stage_{i}": row}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
