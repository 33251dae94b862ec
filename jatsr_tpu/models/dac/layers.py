"""Primitive layers for the DAC port: torch-semantics 1-D convs + Snake.

The pretrained DAC weights come from PyTorch (weight-normalised Conv1d /
ConvTranspose1d; the reference loads them via the ``dac`` package,
prepare_dataset_v5.py:107-110).  To reuse those weights bit-comparably we
need convolutions with **exactly** torch's geometry.  These helpers wrap
``lax.conv_general_dilated`` in channels-last ``[B, T, C]`` layout (NWC maps
the channel axis onto TPU lanes) and are unit-tested against
``torch.nn.functional.conv1d`` / ``conv_transpose1d``.

Weight layout convention here is ``[K, in, out]`` (WIO).  The converter
(convert.py) folds torch weight-norm ``g * v/||v||`` into plain kernels and
transposes from torch's ``[out, in, K]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
           stride: int = 1, padding: int = 0, dilation: int = 1) -> jax.Array:
    """torch ``F.conv1d`` semantics, channels-last.

    Args:
        x: [B, T, Cin]
        w: [K, Cin, Cout]
        b: [Cout] or None
    Returns: [B, T_out, Cout]
    """
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv1d_transpose(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                     stride: int = 1, padding: int = 0,
                     output_padding: int = 0) -> jax.Array:
    """torch ``F.conv_transpose1d`` semantics, channels-last.

    Args:
        x: [B, T, Cin]
        w: [K, Cin, Cout]  — NOTE: already transposed from torch's
           ``[Cin, Cout, K]`` ConvTranspose layout by the converter.
        b: [Cout] or None
    Returns: [B, (T-1)*stride - 2*padding + K + output_padding, Cout]

    Implemented as a dilated-input convolution with a flipped kernel:
    lhs_dilation=stride, padding = (K-1-p, K-1-p+output_padding).
    """
    k = w.shape[0]
    w_flipped = jnp.flip(w, axis=0)
    out = lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation ``x + (1/alpha) * sin^2(alpha * x)``.

    DAC's Snake1d stores alpha per channel; the 1e-9 guard matches its
    reciprocal clamp.  fp32 for the transcendentals.
    """
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    out = xf + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * xf))
    return out.astype(x.dtype)
