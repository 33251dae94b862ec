"""JaT-AudioSR DiT family, TPU-native (Flax linen).

Re-design of the reference DiT (src/models/jat_audiosr_v2.py:292-448 and
jat_audiosr_v3.py:311-471) for JAX/XLA on TPU:

- **Time-major layout** ``[B, T, C]`` — the 1024-channel axis sits last and
  maps onto TPU lanes; patchify is then a pure reshape (no transposes in the
  hot path).  The reference uses ``[B, C, T]`` + permutes
  (jat_audiosr_v2.py:224-227).
- **Scanned blocks** — the `depth` DiT blocks run under ``nn.scan`` with
  stacked parameters: one trace instead of 28, which slashes compile time and
  lets XLA pipeline the layer loop.  Per-layer stochastic-depth rates are fed
  as a scanned-over array (reference builds a Python list,
  jat_audiosr_v2.py:351).
- **Grouped-query attention without KV materialisation** — the reference
  ``repeat_interleave``s KV up to the query head count
  (jat_audiosr_v2.py:147-148); here the group axis lives in the einsum, so KV
  stays at ``num_kv_heads`` width in HBM/VMEM.
- **bf16 compute, fp32 islands** — parameters and softmax/logit accumulation
  in fp32, activations bf16 (replaces the reference's AMP GradScaler path,
  train_ddp_v3mod2.py:745).  The sinusoidal time embedding is always fp32.
- **AdaLN-Zero** — modulation nets and the final projection are zero-init so
  the model is the identity at step 0, matching jat_audiosr_v2.py:372-381.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..configs import ModelConfig

# ---------------------------------------------------------------------------
# Positional / time embeddings
# ---------------------------------------------------------------------------


def sinusoidal_time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of continuous t in [0, 1].

    Matches the reference formula (jat_audiosr_v2.py:177-190): frequencies
    ``exp(-log(10000) * i / (dim/2 - 1))``, output ``[sin | cos]``.
    Always computed in fp32 (small-angle precision matters at t ~ 0).
    """
    half = dim // 2
    t = t.astype(jnp.float32)
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def rope_cos_sin(seq_len: int, dim: int, base: float = 10000.0):
    """Precompute RoPE cos/sin tables ``[N, dim]`` in fp32.

    Half-rotation ("GPT-NeoX") layout, matching jat_audiosr_v2.py:60-68:
    frequencies repeat as ``[f0..f_{d/2-1}, f0..f_{d/2-1}]``.
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [N, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [N, dim]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate ``x[..., N, H, D]`` by position along axis -3.

    cos/sin are ``[N, D]`` fp32; rotation happens in the input dtype (the
    tables are cast) — ref jat_audiosr_v2.py:79-91.
    """
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    x_rot = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, None, :].astype(x.dtype)  # [N, 1, D]
    sin = sin[:, None, :].astype(x.dtype)
    return x * cos + x_rot * sin


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class GQAttention(nn.Module):
    """Grouped-query attention with RoPE (ref jat_audiosr_v2.py:94-167).

    KV heads are kept narrow; the query-group axis is contracted inside the
    einsum rather than materialised.  Logits/softmax run in fp32.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, cos, sin, *, deterministic: bool, prenorm=None):
        """``prenorm=(scale, shift)`` (fp32 [B, H] AdaLN modulation rows)
        switches on the fused-prologue serving path: ``x`` is then the RAW
        residual stream and norm+modulate+quant happen INSIDE the fused
        qkv dot kernel (ops/int8_matmul.int8_norm_mod_dot)."""
        cfg = self.cfg
        B, N, _ = x.shape
        Hq, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
        G = cfg.num_groups
        dtype = jnp.dtype(cfg.dtype)
        mk = _dense_factory(cfg)
        dense = lambda feat, name: mk(feat, name,
                                      use_bias=cfg.attention_bias)

        if cfg.fused_qkv and cfg.matmul_precision == "int8_static":
            if prenorm is not None:
                from ..ops.int8_matmul import int8_norm_mod_dot
                from ..ops.quant import QuantParams

                wq, ws, bq = QuantParams(
                    cfg.hidden_size, (Hq + 2 * Hkv) * D,
                    use_bias=cfg.attention_bias, name="qkv_proj")()
                if bq is None:
                    bq = jnp.zeros(((Hq + 2 * Hkv) * D,), jnp.float32)
                qkv = int8_norm_mod_dot(
                    x.astype(dtype), prenorm[0], prenorm[1],
                    wq, ws.reshape(1, -1),
                    bq.reshape(1, -1).astype(jnp.float32),
                    norm=cfg.norm, out_dtype=dtype,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                # One [H, (Hq+2Hkv)*D] dot: a third of the activation-
                # quant passes and launches; bit-identical to separate
                # projections (per-output-column weight scales).
                qkv = dense((Hq + 2 * Hkv) * D, "qkv_proj")(x)
            from ..ops.attention import flash_supported

            if (cfg.attention_impl == "flash" and deterministic
                    and cfg.pos_embed == "rope" and cfg.flash_qkv
                    and flash_supported(N, Hq, Hkv, D)):
                interp = jax.default_backend() != "tpu"
                if cfg.flash_fused_out:
                    # v3.2 (opt-in; measured 82.1 vs 84.2 for v3.1 —
                    # the in-kernel out-proj dot serialises with the head
                    # loop while XLA's separate dot overlaps neighbours):
                    # the int8 output projection rides inside the kernel,
                    # per-head outputs assembled and row-quantised in
                    # VMEM, never visiting HBM.
                    from ..ops.attention import gqa_attention_flash_out
                    from ..ops.quant import QuantParams

                    woq, wos, bo = QuantParams(
                        Hq * D, cfg.hidden_size,
                        use_bias=cfg.attention_bias, name="out_proj")()
                    if bo is None:
                        bo = jnp.zeros((cfg.hidden_size,), jnp.float32)
                    return gqa_attention_flash_out(
                        qkv, cos, sin, woq, wos.reshape(1, -1),
                        bo.reshape(1, -1).astype(jnp.float32),
                        Hq, Hkv, interpret=interp,
                        n_valid=cfg.attn_valid_len,
                    )
                # v3.1: hand the raw fused projection to the kernel —
                # head split AND RoPE happen in-kernel (no XLA slices/
                # rotate-half concats, ~1.3 ms/step at v3 geometry).
                from ..ops.attention import gqa_attention_flash_qkv

                out = gqa_attention_flash_qkv(
                    qkv, cos, sin, Hq, Hkv,
                    interpret=interp, n_valid=cfg.attn_valid_len,
                    int8_qk=cfg.flash_int8_qk,
                    pipeline_v=cfg.flash_pipeline_v,
                    # bf16_weights stays OFF: rounding the softmax weights
                    # to bf16 before exp2 measured 113.2 vs 116.4 — Mosaic
                    # upcasts bf16 transcendentals, so the narrower dtype
                    # only adds converts (same lesson as the bf16-decode
                    # snake finding, PERF.md round 3).
                )
                if prenorm is not None and not cfg.attention_bias:
                    # out_proj with IN-KERNEL activation quant: its
                    # producer is the flash kernel (already materialised
                    # in HBM — nothing for XLA to fuse the quant into),
                    # so the separate quant pass's bf16-read + int8-write
                    # + int8-read is pure loss here.  Numerically
                    # identical to the two-stage path
                    # (tests/test_int8_matmul.py::test_fused_matches_two_stage).
                    from ..ops.int8_matmul import int8_matmul_fused
                    from ..ops.quant import QuantParams

                    wo, wos, _ = QuantParams(
                        Hq * D, cfg.hidden_size, use_bias=False,
                        name="out_proj")()
                    o2 = int8_matmul_fused(
                        out.reshape(B * N, Hq * D), wo,
                        wos.reshape(1, -1), out_dtype=dtype,
                        interpret=interp,
                    )
                    return o2.reshape(B, N, cfg.hidden_size)
                return dense(cfg.hidden_size, "out_proj")(out)
            q = qkv[..., : Hq * D].reshape(B, N, Hq, D)
            k = qkv[..., Hq * D: (Hq + Hkv) * D].reshape(B, N, Hkv, D)
            v = qkv[..., (Hq + Hkv) * D:].reshape(B, N, Hkv, D)
        else:
            q = dense(Hq * D, "q_proj")(x).reshape(B, N, Hq, D)
            k = dense(Hkv * D, "k_proj")(x).reshape(B, N, Hkv, D)
            v = dense(Hkv * D, "v_proj")(x).reshape(B, N, Hkv, D)

        if cfg.pos_embed == "rope":
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        # Training flash path (opt-in, ModelConfig.train_attention_impl):
        # fused forward + custom VJP with in-kernel dropout — no [B, Hq,
        # N, N] tensor ever reaches HBM (ops/attention_train.py).
        if (not deterministic and cfg.train_attention_impl == "flash"
                and cfg.pos_embed == "rope"):
            from ..ops import attention_train as at

            interp = jax.default_backend() != "tpu"
            # train_flash_supported budgets the BACKWARD kernel too — its
            # VMEM footprint is ~2x the forward's (ADVICE r4 #3).
            if at.train_flash_supported(N, Hq, Hkv, D) and \
                    (not interp or at.ALLOW_INTERPRET_DISPATCH):
                if cfg.dropout > 0.0:
                    # Fresh int32 stream id per (step, layer): make_rng
                    # folds in the scan index and the step-level fold_in
                    # already happened in the caller's rng handling.
                    seed = jax.lax.bitcast_convert_type(
                        jax.random.bits(self.make_rng("dropout"), (1,),
                                        jnp.uint32), jnp.int32)
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                out = at.gqa_attention_train(
                    q.reshape(B, N, Hq * D), k.reshape(B, N, Hkv * D),
                    v.reshape(B, N, Hkv * D), seed, Hq, Hkv,
                    dropout_rate=cfg.dropout,
                    interpret=interp,
                )
                return dense(cfg.hidden_size, "out_proj")(out)
            # else: fall through to the XLA einsum path

        # Fused Pallas kernels on the deterministic path (inference/serving);
        # training keeps the XLA einsum (autodiff + attention dropout).
        # "pallas" = per-(batch, q-head) programs; "pallas2" = grouped
        # per-(batch, kv-head) programs (better MXU occupancy at N=345).
        if cfg.attention_impl in ("pallas", "pallas2") and deterministic:
            from ..ops.attention import gqa_attention, gqa_attention_grouped

            fn = (gqa_attention_grouped if cfg.attention_impl == "pallas2"
                  else gqa_attention)
            out = fn(q, k, v, interpret=jax.default_backend() != "tpu")
            out = out.reshape(B, N, Hq * D)
            return dense(cfg.hidden_size, "out_proj")(out)
        if cfg.attention_impl == "flash" and deterministic:
            # v3 kernel: natural flat layout (no head transpose), per-batch
            # programs, manually pipelined head loop (ops/attention.py).
            # Sequences whose whole-sequence tile would blow VMEM fall
            # through to the XLA einsum below.
            from ..ops.attention import flash_supported, gqa_attention_flash

            if flash_supported(N, Hq, Hkv, D):
                out = gqa_attention_flash(
                    q.reshape(B, N, Hq * D), k.reshape(B, N, Hkv * D),
                    v.reshape(B, N, Hkv * D), Hq, Hkv,
                    interpret=jax.default_backend() != "tpu",
                )
                return dense(cfg.hidden_size, "out_proj")(out)
            # else: fall through to the XLA einsum path

        q = q.reshape(B, N, Hkv, G, D)
        # Logits in fp32 on the MXU.
        scores = jnp.einsum(
            "bnkgd,bmkd->bkgnm", q, k, preferred_element_type=jnp.float32
        )
        scores = scores * (1.0 / math.sqrt(D))
        if cfg.scores_dtype == "bfloat16":
            # Subtract the fp32 row-max inside the einsum epilogue, store the
            # (<= 0) shifted logits as bf16 — halves the score matrix's HBM
            # write+read, the dominant attention cost at N=345.  exp/sum
            # still run in fp32 downstream.  Raw exp/sum instead of
            # jax.nn.softmax: the rows are already max-shifted (row max is
            # exactly 0 pre-rounding), so softmax's internal second
            # max-reduce + subtract would be a redundant full pass over the
            # [B, H, N, N] tensor (profiled ~1 ms/step) with a shift that
            # cancels in the normalisation.
            m = jnp.max(scores, axis=-1, keepdims=True)
            scores = (scores - m).astype(jnp.bfloat16)
            e = jnp.exp(scores.astype(jnp.float32))
            weights = e / jnp.sum(e, axis=-1, keepdims=True)
        else:
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if cfg.dropout > 0.0:
            weights = nn.Dropout(rate=cfg.dropout)(
                weights, deterministic=deterministic
            )
        weights = weights.astype(dtype)
        out = jnp.einsum(
            "bkgnm,bmkd->bnkgd", weights, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        out = out.reshape(B, N, Hq * D)
        return dense(cfg.hidden_size, "out_proj")(out)


# ---------------------------------------------------------------------------
# DiT block
# ---------------------------------------------------------------------------


def _dot_general_for(cfg: ModelConfig):
    """Pick the matmul kernel for the large projections: int8 dynamic W8A8
    in serving mode, the default MXU bf16 path otherwise."""
    if cfg.matmul_precision == "int8":
        import functools

        from ..ops.quant import int8_dot_general

        return functools.partial(int8_dot_general, impl=cfg.int8_impl)
    return None


def _dense_factory(cfg: ModelConfig):
    """Factory for the QUANTIZED-ELIGIBLE projections (patch embed, q/k/v/
    out, MLP): nn.Dense for bf16 and dynamic-int8 modes, ``QuantDense``
    (int8 kernels as parameters, ops/quant.py) for ``int8_static`` — the
    serving mode where weight quantisation happens once at load instead of
    per layer per ODE step."""
    dtype = jnp.dtype(cfg.dtype)
    pdtype = jnp.dtype(cfg.param_dtype)
    if cfg.matmul_precision == "int8_static":
        from ..ops.quant import QuantDense

        def make(feat, name, use_bias=True):
            return QuantDense(feat, use_bias=use_bias, dtype=dtype,
                              param_dtype=pdtype, name=name,
                              int8_impl=cfg.int8_impl)
    else:
        dg = _dot_general_for(cfg)

        def make(feat, name, use_bias=True):
            return nn.Dense(feat, use_bias=use_bias, dtype=dtype,
                            param_dtype=pdtype, name=name, dot_general=dg)

    return make


def _norm(cfg: ModelConfig, name: str):
    """Affine-free norm: LayerNorm for v2 (jat_audiosr_v2.py:242), RMSNorm
    for v3 (jat_audiosr_v3.py:261)."""
    if cfg.norm == "rms":
        return nn.RMSNorm(use_scale=False, epsilon=1e-6, dtype=jnp.dtype(cfg.dtype),
                          name=name)
    return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                        dtype=jnp.dtype(cfg.dtype), name=name)


def _drop_path(x, rate, deterministic, rng):
    """Per-sample stochastic depth (ref jat_audiosr_v2.py:21-35).

    `rate` is a traced scalar (scanned per-layer), so the keep decision uses
    jnp.where rather than Python branching.
    """
    if deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep.astype(x.dtype)) * mask.astype(x.dtype)


class DiTBlock(nn.Module):
    """AdaLN-Zero DiT block with GQA (ref jat_audiosr_v2.py:234-289)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, t_emb, cos, sin, dp_rate, deterministic: bool,
                 mod=None):
        cfg = self.cfg
        H = cfg.hidden_size
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)

        # AdaLN modulation: SiLU -> Dense(6H), zero-init (jat_audiosr_v2.py:256-259,
        # 375-377).  Computed from the fp32 t_emb, emitted in compute dtype.
        # The serving sampler passes precomputed ``mod`` tables instead: the
        # modulation depends only on t, so the 50-step ODE can hoist all
        # 28 x [H, 6H] adaln matmuls (36% of the params!) out of the loop
        # (see models.dit.adaln_tables; profiled ~0.8 ms/step).
        if mod is None:
            mod = nn.Dense(
                6 * H, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="adaln",
            )(nn.silu(t_emb))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        expand = lambda m: m[:, None, :]
        mlp_dim = int(H * cfg.mlp_ratio)

        # Fused-prologue serving path: the branch input chain (affine-free
        # norm -> AdaLN modulate -> row quant) folds INTO the qkv / mlp_in
        # dot kernels, so the [B, N, H] residual stream crosses HBM once
        # per branch (ops/int8_matmul.py round-3 kernels).  Requires the
        # full serving stack and an 8-aligned patch count (align_n).
        fused_pro = (
            deterministic and cfg.fused_prologue
            and cfg.matmul_precision == "int8_static"
            and cfg.fused_qkv and cfg.fused_mlp
            and cfg.fused_mlp_impl == "half"
            and cfg.attention_impl == "flash" and cfg.flash_qkv
            and not cfg.flash_fused_out and cfg.pos_embed == "rope"
        )
        if fused_pro:
            from ..ops.int8_matmul import norm_mod_dot_supported

            N_ = x.shape[1]
            qkv_out = (cfg.num_q_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
            fused_pro = (norm_mod_dot_supported(N_, H, qkv_out)
                         and norm_mod_dot_supported(N_, H, mlp_dim))

        if fused_pro:
            h = GQAttention(cfg, name="attn")(
                x, cos, sin, deterministic=deterministic,
                prenorm=(scale_msa.astype(jnp.float32),
                         shift_msa.astype(jnp.float32)))
        else:
            h = _norm(cfg, "norm1")(x)
            h = h * (1 + expand(scale_msa)) + expand(shift_msa)
            h = GQAttention(cfg, name="attn")(h, cos, sin,
                                              deterministic=deterministic)
        # Landmark for the "attn_out" selective remat policy: saving the
        # [B, N, H] attention outputs (tiny vs the scores) lets backward
        # skip re-running attention — the block's most expensive recompute
        # — while everything else replays (ModelConfig.remat_policy).
        h = checkpoint_name(h, "attn_out")
        h = expand(gate_msa) * h
        if not deterministic:
            h = _drop_path(h, dp_rate, deterministic, self.make_rng("dropout"))
        x = x + h

        if fused_pro:
            from ..ops.int8_matmul import int8_norm_mod_dense_gelu_quant
            from ..ops.quant import QuantParams

            w1q, w1s, b1 = QuantParams(H, mlp_dim, name="mlp_in")()
            w2q, w2s, b2 = QuantParams(mlp_dim, H, name="mlp_out")()
            g_q, g_s = int8_norm_mod_dense_gelu_quant(
                x.astype(dtype), scale_mlp.astype(jnp.float32),
                shift_mlp.astype(jnp.float32),
                w1q, w1s, b1.reshape(1, -1).astype(jnp.float32),
                norm=cfg.norm, gelu_impl=cfg.gelu_impl,
                interpret=jax.default_backend() != "tpu",
            )
            acc = jax.lax.dot_general(
                g_q, w2q, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            h = (acc * g_s * w2s + b2).astype(dtype)
            h = expand(gate_mlp) * h
            x = x + h
            return x, None

        h = _norm(cfg, "norm2")(x)
        h = h * (1 + expand(scale_mlp)) + expand(shift_mlp)
        if cfg.fused_mlp and cfg.matmul_precision == "int8_static":
            # One Pallas kernel: dot + dequant + bias + GELU + requantize;
            # its int8 output feeds the second dot without a bf16 HBM
            # round-trip.  Params keep QuantDense's exact layout.
            from ..ops.int8_matmul import int8_dense_gelu_quant, int8_mlp
            from ..ops.quant import QuantParams

            w1q, w1s, b1 = QuantParams(H, mlp_dim, name="mlp_in")()
            w2q, w2s, b2 = QuantParams(mlp_dim, H, name="mlp_out")()
            B_, N_, _ = h.shape
            interp = jax.default_backend() != "tpu"
            # "half" (default): first-half Pallas kernel + XLA s8xs8 second
            # dot — measured best (66.2 audio-sec/s vs 65.9 for the whole-
            # MLP kernel, PERF.md round 2); "full" keeps the hidden [M, 4H]
            # activation entirely in VMEM but Mosaic's in-order compute
            # emission serialises its slab pipeline just enough to lose.
            if cfg.fused_mlp_impl == "full":
                # Whole MLP in one kernel: the [M, 4H] hidden activation
                # never touches HBM (per-(row, slab) g scales — quality-
                # gated, PERF.md round 2).
                h = int8_mlp(
                    h.astype(dtype).reshape(B_ * N_, H), w1q, w1s,
                    b1.reshape(1, -1).astype(jnp.float32),
                    w2q, w2s.reshape(1, -1), b2.reshape(1, -1),
                    interpret=interp, gelu_impl=cfg.gelu_impl,
                ).astype(dtype).reshape(B_, N_, H)
            else:  # "half": first-half kernel + XLA s8xs8 second dot
                g_q, g_s = int8_dense_gelu_quant(
                    h.astype(dtype).reshape(B_ * N_, H), w1q, w1s,
                    b1.reshape(1, -1).astype(jnp.float32),
                    interpret=interp, gelu_impl=cfg.gelu_impl,
                    fast_epilogue=cfg.fast_epilogue,
                )
                acc = jax.lax.dot_general(
                    g_q, w2q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                h = (acc * g_s * w2s + b2).astype(dtype).reshape(B_, N_, H)
        else:
            mk = _dense_factory(cfg)
            h = mk(mlp_dim, "mlp_in")(h)
            # Landmark for the "mlp" selective remat policy: saving the
            # PRE-GELU [B, N, 4H] activation lets backward skip replaying
            # the block's largest dot (mlp_in, ~40% of block FLOPs) — GELU
            # itself is recomputed from it elementwise.  (Saving the
            # post-GELU hidden instead would NOT avoid the replay: the
            # GELU derivative needs the pre-activation.)
            h = checkpoint_name(h, "mlp_pre")
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
            h = mk(H, "mlp_out")(h)
        h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        h = expand(gate_mlp) * h
        if not deterministic:
            h = _drop_path(h, dp_rate, deterministic, self.make_rng("dropout"))
        x = x + h
        # (carry, per-step output) contract so the block scans under nn.scan.
        return x, None


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class DiT(nn.Module):
    """x0-prediction DiT over DAC latents (ref jat_audiosr_v2.py:292-448).

    Inputs are **time-major**:

    Args:
        x_t:    [B, T, C]  noisy latent.
        t:      [B]        flow time in [0, 1].
        x_cond: [B, T, C]  LR-condition latent.
    Returns:
        [B, T, C] predicted clean latent (fp32).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x_t, t, x_cond, *, deterministic: bool = True,
                 adaln_mod=None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        B, T_orig, C = x_t.shape
        assert C == cfg.input_channels, (C, cfg.input_channels)
        P = cfg.patch_len

        # Cast to compute dtype FIRST: pad/concat/reshape are value-preserving,
        # and doing them in fp32 doubles the HBM traffic of the [B, T, 2C]
        # patchify intermediates (profiled at ~1.1 ms/step at serving
        # geometry before this reordering).
        x_t = x_t.astype(dtype)
        x_cond = x_cond.astype(dtype)

        # Pad T to a multiple of the patch length (jat_audiosr_v2.py:412-416).
        pad = (-T_orig) % P
        # Serving alignment: additionally pad the PATCH count to a sublane
        # multiple (N=345 -> 352 at production geometry).  A sublane-
        # aligned N makes every [B, N, H] <-> [B*N, H] merge around the
        # Pallas kernels a free bitcast instead of a physical tile regroup
        # (profiled ~1.5 ms/step of reshape/pad ops), and the flash
        # kernel's internal pad disappears.  Padded positions are zero
        # (the CFG null token in normalized space), masked as attention
        # KEYS via attn_valid_len, and trimmed from the output — only the
        # flash-QKV kernel implements the key mask, hence the conditions.
        # MEASURED A WASH at v3 geometry (83.6 vs 84.2: the +2-4% extra
        # FLOPs at N=352 eat the reshape savings) — opt-in via
        # ``ModelConfig.align_n``; kept for geometries with worse
        # misalignment.
        n_valid = 0
        if (deterministic and cfg.attention_impl == "flash"
                and cfg.pos_embed == "rope" and cfg.fused_qkv
                and cfg.matmul_precision == "int8_static"
                and cfg.align_n and cfg.flash_qkv):
            n0 = (T_orig + pad) // P
            extra = ((-n0) % 8) * P
            if extra:
                pad += extra
                n_valid = n0
        if n_valid:
            cfg = dataclasses.replace(cfg, attn_valid_len=n_valid)
        if pad:
            x_t = jnp.pad(x_t, ((0, 0), (0, pad), (0, 0)))
            x_cond = jnp.pad(x_cond, ((0, 0), (0, pad), (0, 0)))
        T = T_orig + pad
        N = T // P
        if N > cfg.max_len:
            raise ValueError(f"sequence length {N} exceeds max_len {cfg.max_len}")

        # Patchify: concat channels, then reshape — time-major means no
        # permutes (reference needs permute(0,2,1,3), jat_audiosr_v2.py:226).
        x_in = jnp.concatenate([x_t, x_cond], axis=-1)  # [B, T, 2C]
        x_in = x_in.reshape(B, N, P * 2 * C)

        # Bottleneck patch embed: Dense(P*2C -> bottleneck) -> GELU -> Dense
        # (jat_audiosr_v2.py:204-208).  Serving: same fused dot+GELU+requant
        # kernel as the block MLPs (it IS the same Dense-GELU-Dense shape).
        mk = _dense_factory(cfg)
        Kp, Bn = P * 2 * C, cfg.bottleneck_dim
        if (cfg.fused_mlp and cfg.matmul_precision == "int8_static"
                and Kp % 128 == 0 and Bn % 128 == 0):
            from ..ops.int8_matmul import int8_dense_gelu_quant
            from ..ops.quant import QuantParams

            w1q, w1s, b1 = QuantParams(Kp, Bn, name="patch_in")()
            w2q, w2s, b2 = QuantParams(Bn, cfg.hidden_size,
                                       name="patch_out")()
            g_q, g_s = int8_dense_gelu_quant(
                x_in.astype(dtype).reshape(B * N, Kp), w1q, w1s,
                b1.reshape(1, -1).astype(jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )
            acc = jax.lax.dot_general(
                g_q, w2q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            h = (acc * g_s * w2s + b2).astype(dtype).reshape(
                B, N, cfg.hidden_size)
        else:
            h = mk(cfg.bottleneck_dim, "patch_in")(x_in)
            h = nn.gelu(h, approximate=False)
            h = mk(cfg.hidden_size, "patch_out")(h)

        # v1 legacy: learnable absolute positional embedding added after the
        # patch embed (ref jat_audiosr.py:186-199); RoPE is skipped inside
        # attention in that mode.
        if cfg.pos_embed == "learned":
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (cfg.max_len, cfg.hidden_size), jnp.dtype(cfg.param_dtype),
            )
            h = h + pos[None, :N, :].astype(dtype)

        # Time embedding MLP (fp32; jat_audiosr_v2.py:341-346).
        t_emb = sinusoidal_time_embedding(t, cfg.hidden_size)
        t_emb = nn.Dense(cfg.hidden_size, param_dtype=pdtype, dtype=jnp.float32,
                         name="t_mlp1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(cfg.hidden_size, param_dtype=pdtype, dtype=jnp.float32,
                         name="t_mlp2")(t_emb)
        t_emb = t_emb.astype(dtype)

        # RoPE tables for this sequence length (fp32, cast inside).
        cos, sin = rope_cos_sin(N, cfg.head_dim, cfg.rope_base)

        # Per-layer stochastic-depth rates, linear ramp 0 -> drop_path_rate
        # (jat_audiosr_v2.py:351).
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)

        # Scan the blocks: stacked params, single trace.  Blocks are
        # rematerialised per the configured policy (FLOPs-for-HBM trade;
        # forward-only paths are unaffected).
        if cfg.remat_policy == "none":
            block = DiTBlock
        else:
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy == "attn_out":
                # Selective: save only the [B, N, H] attention outputs
                # (checkpoint_name in DiTBlock) — backward recomputes the
                # cheap elementwise/MLP chain but never re-runs attention,
                # at ~N*H extra HBM per block instead of "dots"'s every-
                # projection footprint.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out")
            elif cfg.remat_policy == "mlp":
                # VERDICT r4 #6 candidate: coarser selective remat — save
                # the attention outputs AND the pre-GELU MLP activations
                # ([B, N, 4H] bf16: ~56 MB/block at 766 M B=16, 1.6 GB for
                # depth 28), so backward replays neither the attention
                # chain nor the block's largest dot.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "mlp_pre")
            else:
                policy = None  # "full": nothing saveable (max recompute)
            block = nn.remat(DiTBlock, static_argnums=(6,), policy=policy)
        mod_axis = nn.broadcast if adaln_mod is None else 0
        ScannedBlocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, 0,
                     nn.broadcast, mod_axis),
            length=cfg.depth,
            # Serving knob: a fully-unrolled scan keeps the stacked param
            # layout but turns the per-iteration weight dynamic-slices
            # into static views (see ModelConfig.unroll_blocks).
            unroll=cfg.depth if cfg.unroll_blocks else 1,
        )
        h, _ = ScannedBlocks(cfg, name="blocks")(h, t_emb, cos, sin, dpr,
                                                 deterministic, adaln_mod)

        # Final layer: affine-free norm + zero-init Dense(H -> P*C)
        # (jat_audiosr_v2.py:358-363, 379-381).
        h = _norm(cfg, "final_norm")(h)
        if cfg.quantize_head and cfg.matmul_precision == "int8_static":
            h = mk(P * C, "final_proj")(h)
        else:
            h = nn.Dense(
                P * C, dtype=dtype, param_dtype=pdtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="final_proj",
                dot_general=(_dot_general_for(cfg) if cfg.quantize_head
                             else None),
            )(h)

        # Unpatchify (pure reshape in time-major layout) and trim padding.
        out = h.reshape(B, T, C)
        if pad:
            out = out[:, :T_orig, :]
        return out.astype(jnp.float32)


def adaln_tables(cfg: ModelConfig, params, t: jax.Array) -> jax.Array:
    """Precompute every layer's AdaLN modulation for flow time(s) ``t``.

    The modulation path (t -> sinusoid -> t-MLP -> SiLU -> per-layer
    Dense(6H)) depends ONLY on t, so a sampler with a static step schedule
    can evaluate it once per step outside the ODE loop instead of touching
    the 28 x [H, 6H] adaln weights (36% of all params) every model call.

    Args:
        cfg: the model config (dtypes/sizes).
        params: the model's param tree (unquantized or static-int8 — the
            t-MLP and adaln weights are never quantized).
        t: [B] flow times (the sampler passes [1]; the result broadcasts
            over the batch inside the blocks).
    Returns:
        [depth, B, 6*hidden] modulation stack in compute dtype, i.e. the
        exact tensor each scanned block's adaln Dense would produce.
    """
    dtype = jnp.dtype(cfg.dtype)
    te = sinusoidal_time_embedding(t, cfg.hidden_size)  # fp32 [B, H]
    w1, b1 = params["t_mlp1"]["kernel"], params["t_mlp1"]["bias"]
    w2, b2 = params["t_mlp2"]["kernel"], params["t_mlp2"]["bias"]
    te = te @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    te = nn.silu(te)
    te = te @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    a = nn.silu(te.astype(dtype))
    wa = params["blocks"]["adaln"]["kernel"].astype(dtype)  # [D, H, 6H]
    ba = params["blocks"]["adaln"]["bias"].astype(dtype)    # [D, 6H]
    return jnp.einsum("bh,dhm->dbm", a, wa) + ba[:, None, :]


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
