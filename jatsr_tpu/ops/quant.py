"""Dynamic W8A8 int8 matmuls for serving.

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; for the
compute-bound 50-step CFG sampler this is the main single-chip throughput
lever beyond bf16 (the reference has no quantized path at all).

``int8_dot_general`` is a drop-in ``dot_general`` for ``nn.Dense``:

- weights: symmetric per-output-channel absmax scales.  Inside the
  sampler's ``fori_loop`` the weights are loop-invariant, so XLA hoists
  their quantisation out of the ODE loop — it happens once per call.
- activations: symmetric per-row (per-token) dynamic absmax scales.  The
  same activation feeds q/k/v; XLA CSEs the duplicate quantisations.
- the contraction: XLA's s8xs8 ``dot_general`` DOES hit the v5e MXU int8
  rate (tools/mxu_bench.py, amortized-loop timing: 257-332 TF/s vs
  160-187 TF/s bf16 at DiT shapes; round 1 measured the opposite through
  ~27 ms/dispatch tunnel overhead).  The dot runs at the ACTIVATION'S OWN
  RANK — collapsing [B, N, K] -> [B*N, K] around the dot costs 32% of
  end-to-end sampler throughput (50.9 -> 34.5 audio-sec/s; the reshape
  breaks XLA's producer fusion of the quantisation).  The Pallas kernel
  in ``ops.int8_matmul`` (tuned tiles, ~310 TF/s) stays selectable via
  ``ModelConfig.int8_impl="pallas"``.
- accumulation in int32, rescale in fp32, result in the activation dtype.

int8 x int8 -> int32 is exact, so the XLA and Pallas paths agree to the
output-dtype rounding on any backend.

Opt-in via ``ModelConfig.matmul_precision="int8"`` (serving only; training
and the quality-parity path stay bf16/fp32).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .int8_matmul import _INV127, int8_matmul, int8_matmul_fused


def w8a8_dot(lhs, w_q, w_scale, impl: str = "xla"):
    """``lhs [..., K] @ (w_q * w_scale) -> [..., N]`` with dynamic per-row
    activation quantisation.  ``w_q`` is int8 ``[K, N]``, ``w_scale`` fp32
    ``[1, N]`` (pre-quantized weights — the static path — or quantized by
    the caller).  ``impl`` picks the kernel (``ModelConfig.int8_impl``:
    "xla" default / "pallas" / "fused"), mirroring :func:`int8_dot_general`.
    """
    out_dtype = lhs.dtype
    K, N = w_q.shape
    lead = lhs.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    aligned = K % 128 == 0 and N % 128 == 0 and M >= 32

    if impl == "fused" and jax.default_backend() == "tpu" and aligned:
        out = int8_matmul_fused(
            lhs.reshape(M, K), w_q, w_scale.reshape(1, N),
            out_dtype=out_dtype,
        )
        return out.reshape(*lead, N)

    # Absmax reduce directly on the input dtype (bf16 -> f32 is exact, so
    # the scale is bit-identical to reducing an f32 upcast) and upcast
    # inside the quant expression: keeping ``lhs`` in bf16 lets XLA fuse
    # the f32 convert into each consumer instead of materialising an f32
    # copy of the whole activation (profiled ~1.3 ms/step of
    # convert_element_type at v3 serving geometry).
    a_scale = jnp.max(jnp.abs(lhs), axis=-1, keepdims=True).astype(
        jnp.float32) * _INV127
    a_q = jnp.round(lhs.astype(jnp.float32)
                    / jnp.maximum(a_scale, 1e-12)).astype(jnp.int8)

    if impl == "pallas" and jax.default_backend() == "tpu" and aligned:
        out = int8_matmul(
            a_q.reshape(M, K), a_scale.reshape(M, 1), w_q,
            w_scale.reshape(1, N), out_dtype=out_dtype,
        )
        return out.reshape(*lead, N)

    # The dot runs at the activation's own rank (reshaping around it breaks
    # producer fusion: -32% end-to-end, PERF.md round 2).
    out = jax.lax.dot_general(
        a_q, w_q, (((lhs.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return (out * a_scale * w_scale.reshape((1,) * (out.ndim - 1) + (N,))
            ).astype(out_dtype)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None, impl: str = "xla"):
    ((lc, rc), (lb, rb)) = dimension_numbers
    # nn.Dense contraction: lhs [..., K] x rhs [K, N], no batch dims.
    if (len(lc) != 1 or len(rc) != 1 or lb or rb
            or lc[0] != lhs.ndim - 1 or rc[0] != 0 or rhs.ndim != 2):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    rhs_f = rhs.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(rhs_f), axis=0, keepdims=True) * _INV127
    w_q = jnp.round(rhs_f / jnp.maximum(w_scale, 1e-12)).astype(jnp.int8)
    return w8a8_dot(lhs, w_q, w_scale, impl=impl)


# ---------------------------------------------------------------------------
# Static (pre-quantized) weights: int8 kernels as real parameters
# ---------------------------------------------------------------------------
#
# The dynamic path above re-quantizes the weights inside the model; under
# the sampler's scan-over-layers + ODE fori_loop the quantisation of each
# layer's dynamic-sliced weight stack CANNOT be hoisted by XLA, so it runs
# depth x steps times (profiled at ~2.2 ms/step at v3 serving geometry).
# ``QuantDense`` instead stores int8 kernels + fp32 per-output-channel
# scales as the module's parameters; ``quantize_params_static`` converts a
# trained bf16/f32 param tree once.  Weight numerics are identical to the
# dynamic path (same symmetric absmax quantisation), and serving HBM for
# the weights drops 2x (int8 vs bf16).

from flax import linen as _nn  # noqa: E402  (after-jax import is deliberate)


class QuantDense(_nn.Module):
    """Serving Dense with int8 kernel + fp32 scale parameters.

    Activation quantisation stays dynamic per-row (quality requires it);
    the weight side is static.  Init produces random int8 weights at a
    small scale (benchmarks / tests); real weights come from
    :func:`quantize_params_static`.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    int8_impl: str = "xla"

    @_nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        w_q = self.param(
            "kernel_q",
            lambda key, shape: jax.random.randint(key, shape, -127, 128,
                                                  jnp.int32).astype(jnp.int8),
            (K, self.features),
        )
        # lecun_normal-ish magnitude so random-init outputs are sane.
        w_scale = self.param(
            "kernel_scale",
            lambda key, shape: jnp.full(shape, (1.0 / np.sqrt(K)) * _INV127,
                                        jnp.float32),
            (1, self.features),
        )
        out = w8a8_dot(x.astype(self.dtype), w_q, w_scale,
                       impl=self.int8_impl)
        if self.use_bias:
            b = self.param("bias", _nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            out = out + b.astype(out.dtype)
        return out


class QuantParams(_nn.Module):
    """Parameter holder with QuantDense's exact structure (kernel_q /
    kernel_scale / bias) for paths that consume the raw int8 weights
    directly (e.g. the fused MLP kernel).  Calling it returns the params
    instead of computing a matmul."""

    in_features: int
    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @_nn.compact
    def __call__(self):
        K = self.in_features
        w_q = self.param(
            "kernel_q",
            lambda key, shape: jax.random.randint(key, shape, -127, 128,
                                                  jnp.int32).astype(jnp.int8),
            (K, self.features),
        )
        w_scale = self.param(
            "kernel_scale",
            lambda key, shape: jnp.full(shape, (1.0 / np.sqrt(K)) * _INV127,
                                        jnp.float32),
            (1, self.features),
        )
        b = (self.param("bias", _nn.initializers.zeros,
                        (self.features,), self.param_dtype)
             if self.use_bias else None)
        return w_q, w_scale, b


def quantize_params_static(params, static_params_shape,
                           compute_dtype=jnp.bfloat16):
    """Convert a trained (bf16/f32) param tree to the int8-static layout.

    Args:
        params: params pytree of the dynamic-precision model (every
            quantized projection has a ``kernel`` leaf; stacked scan dims
            allowed: ``[..., K, N]``).
        static_params_shape: pytree (or jax.eval_shape result) of the
            int8_static model's params — defines which projections become
            ``kernel_q``/``kernel_scale``.
        compute_dtype: the model's compute dtype.  The dynamic path sees
            kernels AFTER nn.Dense's promotion to this dtype, so the static
            quantisation must round through it to stay bit-identical.
    Returns:
        Params pytree matching ``static_params_shape``'s structure.
    """
    def kernel_f32(src):
        w = jnp.asarray(src["kernel"])
        return w.astype(compute_dtype).astype(jnp.float32)

    def convert(src: dict, dst: dict) -> dict:
        out = {}
        for k, v in dst.items():
            if k == "qkv_proj" and k not in src:
                # fused_qkv serving layout: concatenate the trained q/k/v
                # projections on the feature axis (kernels [..., K, N],
                # biases [..., N]); per-output-column scales keep the fused
                # quantisation bit-identical to three separate dots.
                parts = [src[n] for n in ("q_proj", "k_proj", "v_proj")]
                merged = {"kernel": jnp.concatenate(
                    [p["kernel"] for p in parts], axis=-1)}
                if "bias" in parts[0]:
                    merged["bias"] = jnp.concatenate(
                        [p["bias"] for p in parts], axis=-1)
                out[k] = convert(merged, v)
                continue
            if k == "kernel_q":
                w = kernel_f32(src)
                s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) * _INV127
                out[k] = jnp.round(
                    w / jnp.maximum(s, 1e-12)).astype(jnp.int8)
            elif k == "kernel_scale":
                w = kernel_f32(src)
                out[k] = jnp.max(jnp.abs(w), axis=-2, keepdims=True) * _INV127
            elif isinstance(v, dict):
                out[k] = convert(src[k], v)
            else:
                out[k] = src[k]
        return out

    import flax

    src = flax.core.unfreeze(params)
    dst = flax.core.unfreeze(static_params_shape)
    return convert(src, dst)
