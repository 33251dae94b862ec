"""Micro-bench: where does mlp_in's 0.58 ms/layer go, and can it shrink?

Round-2 profiling (PERF.md) shows the int8 mlp_in fusion at 580 us/call
vs a ~220 us pure-dot floor — the dequant+bias+GELU+absmax epilogue over
[5520, 5120] appears to run SERIALLY after the dot inside XLA's kOutput
fusion.  This tool measures, with amortized in-loop timing (the tunnel
adds ~26 ms/dispatch):

  1. the int8 dot alone,
  2. dot + dequant epilogue,
  3. dot + dequant + GELU (erf / tanh / sigmoid variants),
  4. dot + full epilogue (GELU + absmax row stats for the next quant),
  5. the same epilogues WITHOUT the dot (pure VPU cost),

which separates MXU time, VPU time, and the serialization overhead, and
quantifies what a cheaper GELU approximation or a pipelined Pallas
kernel could recover.  Run on the real chip: python tools/mlp_epilogue_bench.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from jatsr_tpu.ops.int8_matmul import quantize_cols
from jatsr_tpu.utils.runtime import enable_compilation_cache

M, K, N = 5520, 1280, 5120  # mlp_in at v3 serving geometry (B=8 CFG-doubled)
INNER = 300


def _gelu_erf(x):
    return jax.nn.gelu(x, approximate=False)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _gelu_sigmoid(x):
    return x * jax.nn.sigmoid(1.702 * x)


def bench(fn, x, *rest) -> float:
    """Amortized per-iteration seconds of ``fn(x, *rest)`` with the output
    folded back into ``x`` (data dependence defeats CSE/hoisting)."""

    @jax.jit
    def loop(x, *a):
        def body(_, carry):
            x0 = carry[0]
            out = fn(x0, *carry[1:])
            x0 = x0 * 0.999 + 0.001 * out[: x0.shape[0],
                                          : x0.shape[1]].astype(x0.dtype)
            return (x0,) + carry[1:]
        return jax.lax.fori_loop(0, INNER, body, (x,) + a)[0]

    r = loop(x, *rest)
    float(r.mean())
    t0 = time.perf_counter()
    float(loop(x, *rest).mean())
    return (time.perf_counter() - t0) / INNER


def main():
    enable_compilation_cache()
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    w = jnp.asarray(rs.randn(K, N) * 0.02, jnp.float32)
    w_q, w_s = quantize_cols(w)
    b = jnp.asarray(rs.randn(N) * 0.01, jnp.float32)

    def quant_rows(xf):
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) * (1.0 / 127.0)
        return jnp.round(xf / jnp.maximum(s, 1e-12)).astype(jnp.int8), s

    def dot_only(x0, w_q, w_s):
        xf = x0.astype(jnp.float32)
        a_q, a_s = quant_rows(xf)
        acc = jax.lax.dot_general(a_q, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * a_s * w_s).astype(jnp.bfloat16)

    def make_full(act):
        def f(x0, w_q, w_s, b):
            xf = x0.astype(jnp.float32)
            a_q, a_s = quant_rows(xf)
            acc = jax.lax.dot_general(a_q, w_q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = act(acc.astype(jnp.float32) * a_s * w_s + b)
            g_q, g_s = quant_rows(y)
            # return bf16 so the loop's data-dependence cast is cheap
            return g_q.astype(jnp.bfloat16)
        return f

    def vpu_only(act):
        def f(x0, b):
            # same element count as the epilogue, no dot
            y = act(x0.astype(jnp.float32) * 1.001 + b[:x0.shape[1]])
            g_q, _ = quant_rows(y)
            return g_q.astype(jnp.bfloat16)
        return f

    results = {}
    results["dot+dequant"] = bench(dot_only, x, w_q, w_s)
    for name, act in [("erf", _gelu_erf), ("tanh", _gelu_tanh),
                      ("sigmoid", _gelu_sigmoid)]:
        results[f"dot+dequant+gelu_{name}+requant"] = bench(
            make_full(act), x, w_q, w_s, b)
    big = jnp.asarray(rs.randn(M, N), jnp.bfloat16)
    for name, act in [("erf", _gelu_erf), ("tanh", _gelu_tanh),
                      ("sigmoid", _gelu_sigmoid)]:
        results[f"vpu_only_gelu_{name}+requant"] = bench(
            vpu_only(act), big, b)

    print(f"[mlp_epilogue_bench] M={M} K={K} N={N}, "
          f"{INNER} chained iters, {jax.default_backend()}")
    for k, v in results.items():
        print(f"  {k:42s} {v*1e6:9.1f} us")
    flops = 2 * M * K * N
    t = results["dot+dequant"]
    print(f"  dot+dequant rate: {flops/t/1e12:.0f} TF/s")


if __name__ == "__main__":
    main()
