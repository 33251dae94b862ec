"""On-chip validation of the C=768 fused res-unit path (round 5).

Runs res_unit_fused at decoder stage-0's REAL geometry (T=23072, C=768,
dilations 1/3/9) on the TPU — the Mosaic compile itself is the first
check (the kernel holds 9.4 MB of resident weights beside a 128-row
block; a VMEM overflow fails here, isolated from the driver bench) —
then compares against the XLA conv composition (max abs / rel diff) and
times both.  Exits nonzero if the kernel fails to compile/run or the
numerics drift beyond the bf16-dot tolerance the C<=384 kernels are held
to (tests/test_dac_kernels.py).

Usage: python tools/validate_c768.py [--t 23072]
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
import numpy as np

from jatsr_tpu.ops import dac_kernels as dk
from jatsr_tpu.utils.runtime import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=23072)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    T, C = args.t, 768
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (1, T, C), jnp.float32)
    w7 = jax.random.normal(ks[1], (7, C, C), jnp.float32) * 0.02
    b7 = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (C, C), jnp.float32) * 0.02
    b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    a1 = jnp.abs(jax.random.normal(ks[5], (C,), jnp.float32)) + 0.5
    a2 = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) + 0.5

    report = {"T": T, "C": C}
    for d in (1, 3, 9):
        assert dk.res_unit_supported(C, T, d), (C, T, d)
        got = dk.res_unit_fused(x, w7, b7, w1, b1, a1, a2, dilation=d)
        got.block_until_ready()

        from jatsr_tpu.models.dac.layers import conv1d, snake

        @jax.jit
        def ref(xx):
            y = snake(xx, a1)
            y = conv1d(y, w7, b7, padding=3 * d, dilation=d)
            y = snake(y, a2)
            y = conv1d(y, w1[None], b1)
            return xx + y

        want = ref(x)
        diff = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want)))
        report[f"d{d}_max_abs_diff"] = round(diff, 6)
        report[f"d{d}_rel"] = round(diff / max(scale, 1e-9), 6)

        # amortized timing, both paths
        def chain(fn):
            @jax.jit
            def loop(xx):
                def body(i, x0):
                    return x0 * 0.999 + 0.001 * jnp.mean(fn(x0))
                return jax.lax.fori_loop(0, args.iters, body, xx)
            # scalar-fetch warmup barrier (block_until_ready lies under
            # the tunnel: the first d=1 measurement absorbed the warmup's
            # real execution and read 51 ms vs the true ~5.7)
            float(loop(x).mean())
            t0 = time.perf_counter()
            r = float(loop(x).mean())
            assert r == r
            return (time.perf_counter() - t0) / args.iters

        report[f"d{d}_fused_ms"] = round(1e3 * chain(
            lambda xx: dk.res_unit_fused(xx, w7, b7, w1, b1, a1, a2,
                                         dilation=d)), 3)
        report[f"d{d}_xla_ms"] = round(1e3 * chain(ref), 3)
        print(json.dumps({f"d{d}": {k: v for k, v in report.items()
                                    if k.startswith(f"d{d}")}}), flush=True)

    ok = all(report[f"d{d}_rel"] < 0.05 for d in (1, 3, 9))
    report["ok"] = ok
    print(json.dumps(report))
    Path("reports/r5").mkdir(parents=True, exist_ok=True)
    Path("reports/r5/c768_validate.json").write_text(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
