"""Micro-benchmark: bf16 vs XLA-int8 vs Pallas-int8 matmul at DiT shapes.

Establishes whether the serving int8 path actually reaches the v5e MXU
int8 rate (round-1 finding: XLA s8xs8 dot_general is SLOWER than bf16).

Timing methodology: the axon tunnel adds ~26 ms per dispatch+fetch, so a
single-op measurement is pure overhead.  Each variant runs ``INNER``
data-dependent iterations inside ONE jitted program (the next iteration's
operand depends on the previous output, so XLA cannot hoist or CSE the
matmul), with one host fetch at the end; per-op time subtracts the measured
empty-dispatch overhead.

Run on the real chip: ``python tools/mxu_bench.py``.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from jatsr_tpu.ops.int8_matmul import int8_matmul, quantize_cols, quantize_rows
from jatsr_tpu.utils.runtime import enable_compilation_cache

# (M, K, N): DiT v3 serving shapes at B=8 (CFG-doubled to 16), N_patch=345.
SHAPES = [
    (5520, 1280, 5120),   # mlp_in
    (5520, 5120, 1280),   # mlp_out
    (5520, 1280, 1280),   # q / out_proj
    (5520, 8192, 512),    # patch_in
]

# Bench-default shapes (B=12 CFG-doubled to 24, align_n: N_patch=352 under
# the fused prologue): --b12.  Adds the fused-QKV dot ((20+2*4)*64 = 1792
# output cols) so every serving projection has a measured ceiling for the
# round-5 per-op floor table.
SHAPES_B12 = [
    (8448, 1280, 5120),   # mlp_in
    (8448, 5120, 1280),   # mlp_out
    (8448, 1280, 1792),   # fused qkv
    (8448, 1280, 1280),   # out_proj
]
INNER = 500


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])  # tunnel-safe barrier


def timeit(fn, *args, iters=5):
    fn(*args)  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def _noop(x):
    return x + 1.0


@partial(jax.jit, static_argnames=("impl",))
def loop_bf16(a, w, impl="bf16"):
    def body(i, carry):
        a_i, acc = carry
        y = a_i @ w
        # Consume ALL of y (a single-element read lets XLA slice the dot
        # down to one row) and couple the next iteration to it with a
        # statically-unprovable identity.
        tot = jnp.sum(y.astype(jnp.float32))
        coup = (1.0 + tot * 1e-38).astype(a.dtype)
        return (a_i * coup, acc + tot)

    _, acc = jax.lax.fori_loop(0, INNER, body, (a, jnp.float32(0)))
    return acc


@partial(jax.jit, static_argnames=("impl", "bm", "bn"))
def loop_int8(a_q, a_s, w_q, w_s, impl="pallas", bm=0, bn=0):
    def body(i, carry):
        a_i, acc = carry
        if impl == "pallas":
            y = int8_matmul(a_i, a_s, w_q, w_s, block_m=bm, block_n=bn)
        else:
            o = jax.lax.dot_general(
                a_i, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (o.astype(jnp.float32) * a_s * w_s).astype(jnp.bfloat16)
        # int8 coupling: consume all of y; add a runtime zero the
        # simplifier can't prove is zero.
        tot = jnp.sum(y.astype(jnp.float32))
        eps = (tot * 1e-38).astype(jnp.int8)
        return (a_i + eps, acc + tot)

    _, acc = jax.lax.fori_loop(0, INNER, body, (a_q, jnp.float32(0)))
    return acc


def main():
    enable_compilation_cache()
    rs = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    x = jnp.zeros((8, 128), jnp.float32)
    overhead = timeit(_noop, x, iters=10)
    print(f"dispatch+fetch overhead: {overhead*1e3:.2f} ms")

    for M, K, N in (SHAPES_B12 if "--b12" in sys.argv else SHAPES):
        a = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
        w = jnp.asarray(rs.randn(K, N) * 0.05, jnp.bfloat16)
        flops = 2 * M * K * N

        w_q, w_s = quantize_cols(w)
        a_q, a_s = quantize_rows(a)
        w_q, w_s, a_q, a_s = jax.device_put((w_q, w_s, a_q, a_s))

        rows = {}
        rows["bf16"] = timeit(loop_bf16, a, w)
        rows["xla-i8"] = timeit(partial(loop_int8, impl="xla"),
                                a_q, a_s, w_q, w_s)
        rows["pallas-i8"] = timeit(partial(loop_int8, impl="pallas"),
                                   a_q, a_s, w_q, w_s)
        if "--sweep" in sys.argv:
            for bm in (256, 512, 1024, 2048):
                for bn in (256, 512, 1024):
                    if bn > N or bm * K + K * bn > 6 * 2**20:
                        continue
                    t = timeit(partial(loop_int8, impl="pallas", bm=bm, bn=bn),
                               a_q, a_s, w_q, w_s, iters=3)
                    rows[f"pl{bm}x{bn}"] = t

        msg = f"[{M}x{K}x{N}]"
        for name, t in rows.items():
            per = (t - overhead) / INNER
            msg += f" | {name} {per*1e6:8.1f} us ({flops/per/1e12:6.1f} TF/s)"
        print(msg)


if __name__ == "__main__":
    main()
