"""Capture a jax.profiler trace of one sampler call and summarise op time.

Answers "where do the milliseconds go" for the serving path (PERF.md's
per-forward budget).  Writes the raw trace under --out and, when
tensorboard-plugin-profile can parse it, prints the top-N ops by self
time.

Usage: python tools/profile_sampler.py [--int8/--bf16] [--steps 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize_trace(out_dir: str, top: int = 25):
    """Parse the trace_viewer JSON (trace.json.gz) into self-time per op."""
    files = sorted(glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("[profile] no trace.json.gz found; raw xplane only")
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep TPU device lanes only (skip host python/runtime threads)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            tot[name] += e.get("dur", 0.0)
    ranked = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"[profile] device total {total/1e3:.2f} ms across "
          f"{len(ranked)} op names; top {top}:")
    for name, us in ranked[:top]:
        print(f"  {us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%  {name[:100]}")

    # Second view: aggregate leaf events by their model-level op (tf_op),
    # which attributes each HLO fusion to the module/op that produced it
    # (e.g. ".../blocks/attn/out_proj/dot_general").  Skip container events
    # (jit wrappers / while loops) so time isn't double counted.
    by_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("jit_", "while")):
            continue
        op = e.get("args", {}).get("tf_op", "")
        # strip the common jit(...)/while/body prefix for readability
        for marker in ("closed_call/", "body/"):
            idx = op.rfind(marker)
            if idx >= 0:
                op = op[idx + len(marker):]
        by_op[op or name] += e.get("dur", 0.0)
    ranked_op = sorted(by_op.items(), key=lambda kv: -kv[1])
    leaf_total = sum(by_op.values())
    print(f"[profile] by model op (leaf total {leaf_total/1e3:.2f} ms), "
          f"top {top}:")
    for op, us in ranked_op[:top]:
        print(f"  {us/1e3:9.3f} ms  {100*us/max(leaf_total,1e-9):5.1f}%  "
              f"{op[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="ODE steps (a few are enough; per-step cost is flat)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bf16", dest="int8", action="store_false", default=True)
    ap.add_argument("--precision", default=None,
                    choices=["bf16", "int8", "int8_static"],
                    help="overrides --bf16/--int8 when given")
    ap.add_argument("--scores-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--attention", default="xla",
                    choices=["xla", "pallas", "pallas2", "flash"])
    ap.add_argument("--quantize-head", action="store_true")
    ap.add_argument("--fused-prologue", action="store_true")
    ap.add_argument("--out", default="/tmp/jatsr_profile")
    ap.add_argument("--summarize-only", default=None,
                    help="skip capture; summarise an existing trace dir")
    args = ap.parse_args()

    if args.summarize_only:
        summarize_trace(args.summarize_only)
        return

    import jax
    import jax.numpy as jnp

    from jatsr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from jatsr_tpu.configs import SamplerConfig, get_preset
    from jatsr_tpu.models import DiT
    from jatsr_tpu.sampling import FlowSampler

    preset = get_preset("v3")
    mcfg = dataclasses.replace(
        preset.model, param_dtype="bfloat16", dropout=0.0, drop_path_rate=0.0,
        matmul_precision=args.precision or ("int8" if args.int8 else "bf16"),
        quantize_head=args.quantize_head,
        scores_dtype=args.scores_dtype,
        fused_mlp=args.fused_mlp,
        fused_qkv=(args.precision or ("int8" if args.int8 else "bf16"))
        == "int8_static",
        attention_impl=args.attention,
        fused_prologue=args.fused_prologue,
        align_n=args.fused_prologue,
    )
    model = DiT(mcfg)
    B, T, C = args.batch, 1378, mcfg.input_channels
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(key, (B, T, C), jnp.float32)
    params = model.init({"params": key, "dropout": key},
                        cond, jnp.zeros((B,), jnp.float32), cond)["params"]
    from jatsr_tpu.models.dit import adaln_tables

    sampler = FlowSampler(
        lambda p, z, t, c, mod=None: model.apply({"params": p}, z, t, c,
                                                 adaln_mod=mod),
        SamplerConfig(num_steps=args.steps, cfg_scale=3.0), params=params,
        adaln_fn=lambda p, tv: adaln_tables(mcfg, p, tv),
    )

    def run(i):
        return float(sampler(jax.random.PRNGKey(i), cond).mean())

    run(0)  # compile outside the trace
    with jax.profiler.trace(args.out):
        run(1)
    print(f"[profile] trace written to {args.out}")
    summarize_trace(args.out)


if __name__ == "__main__":
    main()
