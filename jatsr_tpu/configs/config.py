"""Configuration for the jatsr_tpu framework.

The reference repo expresses each experiment "version" as a full copy of the
training script (train_ddp*.py x9, see /root/reference).  Here every version
is a *preset* of the same dataclasses:

==========  =========================================  ============================
preset      model                                      training specifics
==========  =========================================  ============================
``v1``      DiT 512h/12L 8Q/4KV  (~60 M)               MSE (ref train_ddp_v1.py:64)
``v2``      DiT 1024h/16L 16Q/4KV (~288 M)             MSE (ref train_ddp_v2.py:64)
``v3``      DiT 1280h/28L 20Q/4KV (~766 M)             MSE (ref train_ddp_v3.py:64)
``v3m2``    v3 + RMSNorm                               MSE + CFG dropout 0.1,
                                                       cond-noise 0.02
                                                       (ref train_ddp_v3m2.py:86)
``v3mod2``  v3 (LayerNorm)                             MSE + latent-perceptual
                                                       stack (ref
                                                       train_ddp_v3mod2.py:361)
``v3mod3``  v3 (LayerNorm)                             Charbonnier + latent-
                                                       perceptual (ref
                                                       train_ddp_v3mod3.py:400)
==========  =========================================  ============================

All presets share the DAC latent geometry: 1024 channels, x512 hop at
44.1 kHz, 16 s training crops -> 1378 frames -> 345 patches of length 4
(ref train_ddp_v3mod2.py:337-340).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    """DiT architecture (ref src/models/jat_audiosr_v2.py:292-448, _v3.py:311)."""

    input_channels: int = 1024
    cond_channels: int = 1024
    patch_len: int = 4
    hidden_size: int = 1280
    depth: int = 28
    num_q_heads: int = 20
    num_kv_heads: int = 4
    bottleneck_dim: int = 512
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    drop_path_rate: float = 0.05
    norm: str = "layer"  # "layer" (v2, ref jat_audiosr_v2.py:242) | "rms" (v3, ref jat_audiosr_v3.py:261)
    # "rope" (v2+, ref jat_audiosr_v2.py:50) | "learned" (v1 legacy:
    # learnable absolute positions, ref jat_audiosr.py:186-199).
    pos_embed: str = "rope"
    # QKV / output projection biases.  The v1-legacy model uses
    # nn.MultiheadAttention whose projections carry biases
    # (ref jat_audiosr.py:95); v2+ GQA projections are bias-free
    # (ref jat_audiosr_v2.py:110-117).
    attention_bias: bool = False
    rope_base: float = 10000.0
    rope_max_seq_len: int = 4096  # ref jat_audiosr_v2.py:53
    max_len: int = 2048  # max patch-sequence length (ref jat_audiosr_v2.py:338)
    # dtype policy: bf16 compute / fp32 params is TPU-native; fp32 islands are
    # kept for the time embedding and the final output.
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Attention backend: "xla" (einsum, default) or "pallas" (fused kernel).
    attention_impl: str = "xla"
    # TRAINING attention backend: "flash" (DEFAULT since round 4 —
    # ops/attention_train.py: fused Pallas forward + hand-written VJP;
    # every score-sized tensor stays in VMEM and dropout is an in-kernel
    # counter-hash; 766 M step 0.449 -> 0.307 s, PERF.md round 4) or
    # "xla" (einsum — materialises the fp32 [B, Hq, N, N] scores in HBM
    # in forward, remat-recompute and backward, and draws the
    # attention-dropout mask over the same shape with the host-keyed
    # PRNG).  Numerics are not bit-identical to the einsum path (same
    # class of difference as the serving flash kernel); the default is
    # gated by exact per-kernel gradient parity tests
    # (tests/test_attention_train.py) AND a seed-matched 100-step
    # loss-curve run on real data (tools/train_attn_gate.py: max rel
    # loss diff 0.0000%).  Off-TPU the model falls back to "xla"
    # automatically (interpret-mode Pallas is too slow to train with).
    train_attention_impl: str = "flash"
    # Storage dtype of the materialised attention-score matrix on the XLA
    # path.  "float32" = exact (default).  "bfloat16" halves the HBM
    # round-trip of the [B, H, N, N] scores (the dominant attention cost at
    # serving geometry): logits still accumulate in fp32 on the MXU and the
    # row-max is subtracted in fp32 BEFORE the downcast, so only the
    # post-subtraction logits round to bf16 (~0.4% relative on the softmax
    # weights).  Serving knob — quality-gate before defaulting.
    scores_dtype: str = "float32"
    # Projection matmul precision: "bf16" (default), "int8" (dynamic W8A8
    # on the big projections — serving mode; ~2x MXU rate on v5e), or
    # "int8_static" (int8 kernels ARE the parameters: weight quantisation
    # happens once at load via ops.quant.quantize_params_static instead of
    # per layer per ODE step, and weight HBM halves; weight numerics are
    # identical to "int8").
    matmul_precision: str = "bf16"
    # Extend int8 to the output head (final_proj, ~58 GFLOP/forward at v3
    # geometry).  Separate knob: the head writes the predicted latent
    # directly, so its quantisation is gated on its own quality eval.
    quantize_head: bool = False
    # Fuse the serving MLP's first half (dot + dequant + bias + GELU +
    # requantize) into one Pallas kernel whose int8 output feeds the second
    # dot directly (ops/int8_matmul.py:int8_dense_gelu_quant).  Requires
    # matmul_precision="int8_static"; inference-only.
    fused_mlp: bool = False
    # Fused-MLP variant: "half" (first-half kernel + XLA s8xs8 second dot —
    # measured best, PERF.md round 2) or "full" (whole MLP in one kernel,
    # the hidden [M, 4H] never leaves VMEM; per-(row, slab) scales).
    fused_mlp_impl: str = "half"
    # In-kernel GELU form for the fused serving MLP: "tanh" (one
    # transcendental, +14% end-to-end, quality-gated) or "erf" (A&S 7.1.26
    # polynomial — matches nn.gelu(approximate=False) to bf16 tolerance).
    gelu_impl: str = "tanh"
    # Fused-MLP epilogue precision: True keeps the kernel epilogue fp32
    # end-to-end (fewer VPU converts, strictly more precise, quality-gated);
    # False inserts the bf16 round-trips exactly where the unfused
    # QuantDense/nn.gelu path has them (bit-match-the-unfused-path mode).
    fast_epilogue: bool = True
    # With attention_impl="flash" + fused_qkv: consume the UNSPLIT fused
    # QKV projection and apply RoPE in-kernel (flash v3.1 — the default;
    # False falls back to the split-path v3 kernel).
    flash_qkv: bool = True
    # flash v3.2: fuse the int8 output projection into the attention
    # kernel.  Measured SLOWER than v3.1 (82.1 vs 84.2, PERF.md round 2) —
    # kept as an option for other geometries.
    flash_fused_out: bool = False
    # flash v3.3 (OPT-IN, quality-gate before defaulting): run the score
    # and value dots inside the flash kernel as s8 x s8 -> s32 (double
    # MXU rate; both dots underfill the lanes at D=64).  q/k/softmax rows
    # quantised per row, v per column — scales factor out exactly.
    flash_int8_qk: bool = False
    # flash v3.5: defer each head's value dot one head-loop iteration so
    # the softmax epilogue (the round-3 profile's dominant non-dot cost)
    # is issued between two MXU dots it has no dependency on — Mosaic can
    # hide the VPU work under the MXU stream (VERDICT r4 #1).  Identical
    # math and VMEM footprint; measure before defaulting.
    flash_pipeline_v: bool = False
    # Pad the patch count N to a sublane multiple (345 -> 352) on the flash
    # serving path so [B, N, H] <-> [B*N, H] merges are free bitcasts.
    # Measured a WASH at v3 geometry (PERF.md round 2) — opt-in.
    align_n: bool = False
    # Dynamic-int8 matmul backend: "xla" (s8xs8 dot_general — default,
    # reaches the v5e int8 MXU rate), "pallas" (ops/int8_matmul.int8_matmul)
    # or "fused" (in-kernel activation quant; loses end-to-end at v3
    # geometry — reshape breaks producer fusion, PERF.md round 2).
    int8_impl: str = "xla"
    # Fuse each branch's whole input path — affine-free norm + AdaLN
    # modulate + dynamic row quant — into the qkv / mlp_in dot kernels
    # (ops/int8_matmul.py:int8_norm_mod_dot / _dense_gelu_quant): the
    # [B, N, H] activation crosses HBM once per branch instead of ~3
    # times.  Requires the full serving stack (int8_static + fused_qkv +
    # fused_mlp "half" + flash v3.1) and an 8-aligned patch count
    # (pair with align_n at production geometry).  Serving only.
    fused_prologue: bool = False
    # Unroll the scanned block stack (nn.scan unroll=depth).  The scan's
    # per-step dynamic-slice of each layer's stacked weights materialises
    # a COPY every iteration (profiled ~0.55 ms/step at v3 serving
    # geometry: s8[28,1280,5120] -> s8[1280,5120] at ~48 GB/s); unrolled,
    # the slices are static leading-dim views and XLA prefetches weights
    # across layers.  Costs one-off compile time (28x block HLO) — a
    # serving knob; training keeps the scan.
    unroll_blocks: bool = False
    # Merge q/k/v projections into one [H, (Hq+2*Hkv)*D] int8 dot: one
    # activation-quant pass + one kernel launch instead of three.  Bit-
    # identical to separate projections (per-output-column weight scales;
    # same per-row input scale).  Requires matmul_precision="int8_static";
    # quantize_params_static concatenates trained q/k/v weights on load.
    fused_qkv: bool = False
    # INTERNAL: real (pre-padding) patch count when DiT pads the sequence
    # to a sublane multiple on the flash serving path (sublane-aligned N
    # makes every [B, N, H] <-> [B*N, H] merge a free bitcast instead of
    # a physical tile regroup).  Set by DiT.__call__ via
    # dataclasses.replace; 0 = no alignment padding.
    attn_valid_len: int = 0
    # Backward rematerialisation policy per DiT block:
    #   "full" — recompute everything (min HBM),
    #   "attn_out" — save only the [B, N, H] attention outputs: backward
    #                never re-runs attention, the cheapest HBM add,
    #   "mlp" — save attention outputs + pre-GELU MLP activations: backward
    #           replays neither attention nor the block's largest dot
    #           (~1.6 GB at 766 M B=16; VERDICT r4 #6 candidate),
    #   "dots" — save matmul outputs, recompute elementwise (faster bwd),
    #   "none" — no remat (max HBM, fastest).
    remat_policy: str = "full"

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_q_heads == 0
        return self.hidden_size // self.num_q_heads

    @property
    def num_groups(self) -> int:
        assert self.num_q_heads % self.num_kv_heads == 0
        return self.num_q_heads // self.num_kv_heads


@dataclass(frozen=True)
class LossConfig:
    """Loss stack (ref train_ddp_v3mod2.py:361-373, _v3mod3.py:400-436)."""

    # Main reconstruction loss: "mse" or "charbonnier".
    reconstruction: str = "mse"
    charbonnier_eps: float = 1e-6
    reconstruction_weight: float = 1.0

    # Latent Perceptual Loss stack.
    use_latent_perceptual: bool = False
    latent_loss_weight: float = 0.3  # weight relative to reconstruction
    freq_weight: float = 0.5
    ms_weight: float = 0.5
    consistency_weight: float = 0.1
    # Frequency-loss variant: "fixed" (log-mag + low-30% phase, ref
    # train_ddp_v3mod2.py:53-123) or "buggy_v3mod1" — the historical
    # high-freq-weighted linear-magnitude loss that produced "metallic"
    # artifacts (ref train_ddp_v3mod1.py:53-112).  Kept as the NEGATIVE
    # CONTROL the reference retains: training with it should reproduce the
    # failure mode, not be used for production runs.
    freq_loss_variant: str = "fixed"
    high_freq_weight: float = 2.0  # buggy variant's linear ramp endpoint
    low_freq_phase_ratio: float = 0.3  # phase constraint on lowest 30% bins
    ms_scales: Tuple[int, ...] = (1, 2, 4)
    strict_cutoff: float = 0.30  # consistency: complex-L1 band
    soft_cutoff: float = 0.36  # consistency: 16k/44.1k transition edge


@dataclass(frozen=True)
class DataConfig:
    """Data geometry + preprocessing (ref prepare_dataset_v5.py:37-69)."""

    data_dir: str = "data_processed"
    stats_file: str = "global_stats_separated.json"
    target_duration: float = 16.0
    dac_sample_rate: int = 44100
    dac_hop_length: int = 512
    samples_per_epoch_multiplier: int = 6  # ref train_ddp_v3mod2.py:481

    # Offline preprocessing (prepare_dataset).
    high_sr: int = 48000
    low_sr: int = 16000
    chunk_duration: float = 7.0  # valid seconds per encode chunk
    overlap_duration: float = 0.5  # context seconds on each side
    min_duration: float = 1.0
    val_ratio: float = 0.1
    split_seed: int = 42
    # Historical preprocessing generations as one knob (SURVEY §2.4):
    #   "overlap"  7 s valid + 0.5 s context overlap-trim windows — the
    #              v4/v5 scheme (ref prepare_dataset_v4.py:48,133-146,
    #              prepare_dataset_v5.py:142-169; the default).
    #   "plain"    fixed chunk_duration windows with NO context frames —
    #              the v3 scheme (ref scripts/prepare_dataset_v3.py:44,
    #              74-110 used 15 s).
    #   "whole"    one window per song (pow2-bucketed samples) — the v2
    #              scheme (ref scripts/prepare_dataset_v2.py:1-8, whole
    #              songs, one file each; OOM-prone on GPUs, which is why
    #              v3 moved to chunks — on TPU it is just a bigger static
    #              shape per bucket).
    chunking: str = "overlap"

    @property
    def target_frames(self) -> int:
        # 16 * 44100 / 512 = 1378 (ref train_ddp_v3mod2.py:340)
        return int(self.target_duration * self.dac_sample_rate / self.dac_hop_length)


def data_preset(version: str) -> DataConfig:
    """Historical dataset-preparation generations as configs (SURVEY §2.4).

    The reference kept each generation as a separate script; here they are
    one pipeline with the geometry as config:
      v5/v4  overlap-trim windows (prepare_dataset_v5.py / _v4.py) — the
             production scheme and the DataConfig default.
      v3     plain 15 s chunks, no context (scripts/prepare_dataset_v3.py:44).
      v2     whole-song encode + two-pass normalized storage
             (scripts/prepare_dataset_v2.py: pass 1 stats, pass 2
             normalize+save — run PreprocessPipeline.normalize_stored_latents()
             after .run() for pass 2).
    """
    if version in ("v5", "v4"):
        return DataConfig()
    if version == "v3":
        return DataConfig(chunking="plain", chunk_duration=15.0,
                          overlap_duration=0.0)
    if version == "v2":
        return DataConfig(chunking="whole")
    raise ValueError(f"unknown data preset {version!r}")


@dataclass(frozen=True)
class TrainConfig:
    """Training runtime (ref train_ddp_v3mod2.py:327-386)."""

    seed: int = 42
    batch_size: int = 28  # per data-parallel shard
    # Micro-batching: split each batch into N sequential micro-steps with
    # gradient accumulation (match the reference's total batch 56 on fewer
    # chips / less HBM).  1 = off.
    grad_accum_steps: int = 1
    lr: float = 5e-5
    weight_decay: float = 0.1
    warmup_steps: int = 1000
    num_epochs: int = 300
    grad_clip: float = 1.0

    # Regularisation (ref train_ddp_v3mod2.py:358-359, _v3m2.py:86-88).
    condition_noise_ratio: float = 0.05
    use_adaptive_noise: bool = True
    cfg_dropout_prob: float = 0.0  # sample-level cond dropout (v3m2: 0.1)

    # U-shaped timestep sampling exponent (ref train_ddp_v3mod2.py:449-457).
    timestep_alpha: float = 0.5

    # Checkpointing / logging (ref train_ddp_v3mod2.py:384-386).
    save_dir_base: str = "checkpoints"
    log_dir_base: str = "runs"
    save_interval_steps: int = 1000
    # Keep only the newest N interval checkpoints (0 = keep all; the
    # reference accumulates interval_step_*.pt without bound).
    keep_interval_checkpoints: int = 3
    # Save the `last` checkpoint every N epochs (1 = reference parity).
    # On slow device->host links (tunnelled chips, networked fs) per-epoch
    # full-state pulls can dominate epoch time; `best` is still saved
    # whenever validation improves, and interrupt-save always fires.
    save_last_every_epochs: int = 1
    # Save the `best` checkpoint when validation improves, but at most
    # every N epochs (1 = reference parity: write on every improvement).
    # Early training improves val loss almost every epoch, so on slow
    # links the per-improvement full-state pull dominates wall time.
    save_best_every_epochs: int = 1
    log_interval_steps: int = 10

    # Parallelism: data-parallel shards x tensor-parallel shards.
    mesh_shape: Tuple[int, int] = (1, 1)  # (data, model)
    # Rematerialise DiT blocks in the backward pass (trades FLOPs for HBM).
    remat: bool = True
    # Adam moment dtype: "bfloat16" halves optimizer HBM (766M fp32 AdamW
    # needs ~12 GB; bf16 moments fit a single v5e chip), "float32" for exact
    # parity with the reference's AdamW.
    adam_moments_dtype: str = "float32"
    # ZeRO-1: shard optimizer moments over the data axis (all-gather at
    # update time is inserted by GSPMD).
    shard_opt_state: bool = False
    # PRNG implementation: "rbg" is the TPU-native counter PRNG (~26%
    # faster 766M train steps than threefry — dropout mask generation is a
    # real cost); "threefry" for jax-default stream compatibility.
    prng_impl: str = "rbg"


@dataclass(frozen=True)
class SamplerConfig:
    """Flow-matching Euler ODE sampling (ref infer_test_v3m2.py:107-185)."""

    num_steps: int = 50
    cfg_scale: float = 1.0
    # ODE solver: "euler" (reference parity) or "heun" (2nd order; 2 model
    # evals/step — fewer steps for the same accuracy).
    solver: str = "euler"
    t_jump_threshold: float = 0.999  # jump-to-x0 guard near t=1
    velocity_eps: float = 1e-5  # 1/(1-t+eps) guard
    # Guidance interval (fractions of the schedule): CFG's 2x model cost is
    # paid only for t in [lo, hi); outside, the conditional branch alone
    # drives the ODE.  (0, 1) = reference parity (always guided).
    cfg_interval: Tuple[float, float] = (0.0, 1.0)
    # How a guided step evaluates the cond/uncond pair:
    #   "doubled" — one forward on batch 2B (the reference's shape,
    #               infer_test_v3m2.py:154-156);
    #   "split"   — two sequential forwards on batch B.  Same math, same
    #               per-row activation quantisation (batch-independent);
    #               only XLA dot tiling differs.  On a v5e the serving
    #               program is measurably MORE efficient per chunk at
    #               batch 8 than at 16, so split wins for the
    #               always-guided schedule (PERF.md round 4).
    cfg_batching: str = "doubled"
    # Chunked long-audio inference (ref infer_test_v3m2.py:339-362).
    chunk_duration: float = 16.0
    overlap_duration: float = 2.0
    # Initial-noise mapping for chunked inference:
    #   "per_chunk" — chunk i draws from fold_in(key, i) regardless of how
    #                 chunks are batched/grouped/padded; outputs are
    #                 invariant to max_batch and mesh padding.  This is
    #                 also the reference's semantics (its serial chunk loop
    #                 calls torch.randn once per chunk,
    #                 infer_test_v3m2.py:370-398).
    #   "batch"     — one draw over the whole chunk batch (rounds 1-4's
    #                 mapping; outputs depend on grouping).
    chunk_noise: str = "per_chunk"
    # Pad a smaller trailing chunk group up to max_batch (with CFG-null
    # chunks) when a full-size group also ran: every group then reuses ONE
    # compiled sampler program instead of compiling a separate tail-size
    # program (multi-minute 766 M compiles) — exact under "per_chunk"
    # noise since real chunks' draws don't depend on batch size.  Trades
    # up to (max_batch - tail) chunks of extra compute per call; OFF for
    # throughput benches.
    pad_tail_group: bool = False


@dataclass(frozen=True)
class Preset:
    name: str
    model: ModelConfig
    loss: LossConfig
    train: TrainConfig
    data: DataConfig = field(default_factory=DataConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)

    def replace(self, **kw) -> "Preset":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Preset":
        """Rebuild a preset from ``to_json`` output (e.g. the ``preset.json``
        every Trainer run dir carries — the reference's config-in-checkpoint,
        train_ddp_v3mod2.py:1145)."""
        d = json.loads(s)
        return cls(
            name=d["name"],
            model=ModelConfig(**{**d["model"],
                                 "rope_base": float(d["model"]["rope_base"])}),
            loss=LossConfig(**{**d["loss"],
                               "ms_scales": tuple(d["loss"]["ms_scales"])}),
            train=TrainConfig(**{**d["train"],
                                 "mesh_shape": tuple(d["train"]["mesh_shape"])}),
            data=DataConfig(**d["data"]),
            sampler=SamplerConfig(**{
                **d["sampler"],
                # tolerate preset.json written before this field existed
                "cfg_interval": tuple(
                    d["sampler"].get("cfg_interval", (0.0, 1.0))
                ),
            }),
        )


def _mk(name, model_kw, loss_kw, train_kw) -> Preset:
    return Preset(
        name=name,
        model=ModelConfig(**model_kw),
        loss=LossConfig(**loss_kw),
        train=TrainConfig(**train_kw),
    )


_V3_MODEL = dict(hidden_size=1280, depth=28, num_q_heads=20, num_kv_heads=4)

_PRESETS = {
    # Legacy v1 architecture: plain MHA (12 heads == KV heads, biased
    # projections), learnable absolute positions, bottleneck 128
    # (ref src/models/jat_audiosr.py:138-222 defaults; ~79 M).  The
    # reference's own v1 *training* script uses the V2 model — this preset
    # is the model-architecture parity point, not a training recipe.
    "v1legacy": _mk(
        "v1legacy",
        dict(hidden_size=768, depth=12, num_q_heads=12, num_kv_heads=12,
             bottleneck_dim=128, pos_embed="learned", attention_bias=True,
             dropout=0.0, drop_path_rate=0.0),
        dict(reconstruction="mse"),
        dict(),
    ),
    # 60 M sanity config (ref train_ddp_v1.py:64-72).
    "v1": _mk(
        "v1",
        dict(hidden_size=512, depth=12, num_q_heads=8, num_kv_heads=4,
             drop_path_rate=0.0),
        dict(reconstruction="mse"),
        dict(),
    ),
    # 288 M (ref train_ddp_v2.py:64-72).
    "v2": _mk(
        "v2",
        dict(hidden_size=1024, depth=16, num_q_heads=16, num_kv_heads=4,
             drop_path_rate=0.0),
        dict(reconstruction="mse"),
        dict(),
    ),
    # Original full run: V2 model at batch 72, dropout 0.1
    # (ref train_ddp.py:44-70 — the script that predates the v1..v3 line).
    "v2full": _mk(
        "v2full",
        dict(hidden_size=1024, depth=16, num_q_heads=16, num_kv_heads=4,
             dropout=0.1, drop_path_rate=0.0),
        dict(reconstruction="mse"),
        dict(batch_size=72, lr=5e-5, warmup_steps=1000, num_epochs=1000),
    ),
    # 766 M MSE baseline (ref train_ddp_v3.py:64-72).
    "v3": _mk("v3", dict(**_V3_MODEL), dict(reconstruction="mse"), dict()),
    # RMSNorm + CFG training (ref train_ddp_v3m2.py:64-91, jat_audiosr_v3.py).
    "v3m2": _mk(
        "v3m2",
        dict(**_V3_MODEL, norm="rms"),
        dict(reconstruction="mse"),
        dict(cfg_dropout_prob=0.1, condition_noise_ratio=0.02),
    ),
    # NEGATIVE CONTROL: the historical buggy frequency loss that produced
    # "metallic" artifacts (ref train_ddp_v3mod1.py:53-112; no consistency
    # term, freq/ms weights 0.5/0.5 at latent weight 0.3,
    # train_ddp_v3mod1.py:245-247).  Kept so the failure mode stays
    # reproducible — do not train production models with this preset.
    "v3mod1": _mk(
        "v3mod1",
        dict(**_V3_MODEL),
        dict(reconstruction="mse", use_latent_perceptual=True,
             freq_loss_variant="buggy_v3mod1", consistency_weight=0.0),
        dict(),
    ),
    # Recommended config: latent-perceptual stack (ref train_ddp_v3mod2.py).
    "v3mod2": _mk(
        "v3mod2",
        dict(**_V3_MODEL),
        dict(reconstruction="mse", use_latent_perceptual=True),
        dict(),
    ),
    # Charbonnier main loss (ref train_ddp_v3mod3.py:402-436).
    "v3mod3": _mk(
        "v3mod3",
        dict(**_V3_MODEL),
        dict(reconstruction="charbonnier", use_latent_perceptual=True),
        dict(),
    ),
    # RMSNorm + CFG + Charbonnier (ref train_ddp_v3m2mod1.py:72-140).
    "v3m2mod1": _mk(
        "v3m2mod1",
        dict(**_V3_MODEL, norm="rms"),
        dict(reconstruction="charbonnier"),
        dict(cfg_dropout_prob=0.1, condition_noise_ratio=0.02),
    ),
    # Tiny config for tests / overfit gates (not in reference; analogous to
    # tests/test_dac_overfit_v2.py's small model).
    "tiny": _mk(
        "tiny",
        dict(hidden_size=128, depth=2, num_q_heads=4, num_kv_heads=2,
             bottleneck_dim=64, dropout=0.0, drop_path_rate=0.0),
        dict(reconstruction="mse"),
        dict(batch_size=2, warmup_steps=10),
    ),
}


# Deprecated env-var aliases for the serving knobs (round-2 interface).
# The knobs are real ModelConfig fields now — jit caches key on the config,
# and preset.json captures the full serving configuration.  This shim exists
# only so old scripts keep working; it warns on use.
_ENV_ALIASES = {
    "JATSR_FUSED_MLP": ("fused_mlp_impl", str),
    "JATSR_GELU": ("gelu_impl", str),
    "JATSR_FAST_EPILOGUE": ("fast_epilogue", lambda v: v != "0"),
    "JATSR_FLASH_QKV": ("flash_qkv", lambda v: v != "0"),
    "JATSR_FLASH_OUT": ("flash_fused_out", lambda v: v == "1"),
    "JATSR_ALIGN_N": ("align_n", lambda v: v == "1"),
    "JATSR_INT8_IMPL": ("int8_impl", lambda v: v or "xla"),
}


def apply_env_aliases(model_cfg: ModelConfig) -> ModelConfig:
    """DEPRECATED: fold round-2 ``JATSR_*`` env knobs into a ModelConfig.

    Call once at program entry (bench.py / CLI) — never inside traced
    code.  Prefer the explicit config fields / CLI flags.
    """
    import os
    import warnings

    kw = {}
    for env, (field_name, conv) in _ENV_ALIASES.items():
        if env in os.environ:
            warnings.warn(
                f"{env} is deprecated; use ModelConfig.{field_name} "
                f"(or the matching CLI flag)", DeprecationWarning,
                stacklevel=2,
            )
            kw[field_name] = conv(os.environ[env])
    return dataclasses.replace(model_cfg, **kw) if kw else model_cfg


def get_preset(name: str) -> Preset:
    try:
        return _PRESETS[name]
    except KeyError:
        raise KeyError(f"Unknown preset {name!r}; available: {sorted(_PRESETS)}")


def list_presets():
    return sorted(_PRESETS)
