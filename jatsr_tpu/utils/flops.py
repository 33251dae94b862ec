"""Analytic model-FLOPs accounting for MFU reporting (VERDICT r3 #5).

The reference publishes no step timings or FLOP counts (SURVEY.md §6);
these closed-form counts give train/serve throughput an absolute scale:
``MFU = flops_per_step * steps_per_sec / peak_flops``.

Counting convention: multiply-accumulate = 2 FLOPs; elementwise/softmax
work is ignored (it is < 2% of the matmul work at these shapes and not
what the MXU roofline measures).
"""

from __future__ import annotations

# bf16 matmul peak of one TPU v5e chip (the bench/serving hardware).
V5E_BF16_PEAK_FLOPS = 197e12

# Training-step multiplier over one forward: backward is 2x forward;
# rematerialisation replays some of the forward again during backward.
TRAIN_FLOP_FACTOR = {"none": 3.0, "dots": 3.5, "attn_out": 3.9, "full": 4.0}


def dit_forward_flops(cfg, batch: int, frames: int) -> float:
    """Matmul FLOPs of ONE DiT forward at [batch, frames, C] inputs.

    Mirrors models/dit.py: bottleneck patch embed -> depth x (fused-or-not
    QKV, scores, values, out_proj, 2-dot MLP, AdaLN table) -> final proj.
    """
    P = cfg.patch_len
    N = -(-frames // P)  # patch count after pad
    H = cfg.hidden_size
    D = cfg.head_dim
    Hq, Hkv = cfg.num_q_heads, cfg.num_kv_heads
    Cin = cfg.input_channels + cfg.cond_channels
    mlp = int(H * cfg.mlp_ratio)

    per_token_block = (
        2 * H * (Hq + 2 * Hkv) * D      # q/k/v projections (fused or not)
        + 2 * H * H                     # out_proj
        + 2 * H * mlp * 2               # mlp_in + mlp_out
    )
    per_block_attn = 2 * N * N * D * Hq * 2       # scores + values
    per_block = N * per_token_block + per_block_attn + 2 * H * 6 * H  # +adaln
    embed = N * (2 * P * Cin * cfg.bottleneck_dim
                 + 2 * cfg.bottleneck_dim * H)
    head = N * 2 * H * (P * cfg.input_channels)
    t_emb = 2 * H * H * 2
    return float(batch) * (embed + cfg.depth * per_block + head + t_emb)


def train_step_flops(cfg, batch: int, frames: int,
                     grad_accum: int = 1) -> float:
    """Model FLOPs of one optimizer step (fwd + bwd + remat replay)."""
    factor = TRAIN_FLOP_FACTOR.get(cfg.remat_policy, 4.0)
    return dit_forward_flops(cfg, batch, frames) * factor * max(grad_accum, 1)


def sampler_flops(cfg, batch: int, frames: int, num_steps: int,
                  cfg_scale: float = 1.0,
                  cfg_interval=(0.0, 1.0)) -> float:
    """Matmul FLOPs of one ODE sampling call (CFG batch-doubling applied
    only inside the guided window)."""
    lo, hi = cfg_interval
    guided = max(0.0, min(hi, 1.0) - max(lo, 0.0)) if cfg_scale != 1.0 else 0.0
    n_guided = round(num_steps * guided)
    n_plain = num_steps - n_guided
    one = dit_forward_flops(cfg, batch, frames)
    return one * (n_plain + 2 * n_guided)


def mfu(flops_per_step: float, sec_per_step: float,
        peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    return flops_per_step / sec_per_step / peak
