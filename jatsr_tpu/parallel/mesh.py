"""Device mesh + sharding rules (the reference's NCCL/DDP layer, TPU-native).

The reference parallelises with DDP over NCCL: per-GPU processes, bucketed
gradient all-reduce, explicit ``all_reduce`` of validation scalars and
``barrier()`` (train_ddp_v3mod2.py:426-447, 822, 1087-1096).  On TPU none of
that is hand-written: we lay out a ``jax.sharding.Mesh`` with axes

- ``data``  — batch (DDP equivalent; gradient reductions ride ICI via the
  psums GSPMD inserts under ``jax.jit``),
- ``model`` — tensor parallelism over attention heads / MLP hidden / AdaLN
  modulation width (optional; the 766 M model fits one chip, but TP lowers
  latency for serving).

Parameters are annotated with ``NamedSharding``; XLA places the collectives.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh.  ``data=-1`` uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


# Sharding rules for DiT parameters (paths are flax param tree paths with
# the scanned ``blocks`` collection carrying a leading depth axis).  Rules
# are organised by the projection's PARALLELISM KIND, then by leaf name, so
# every parameter layout — bf16 training (``kernel``/``bias``), dynamic
# int8, and int8_static serving (``kernel_q`` int8 + ``kernel_scale``
# per-output-column fp32, incl. the fused ``qkv_proj``) — gets a coherent
# spec.  The invariant: a ``kernel_scale`` ALWAYS follows its kernel's
# OUTPUT-dim sharding (it is per-output-column, shape [..., 1, N]) and its
# size-1 input dim is never sharded.
#
# Column-parallel (output dim over MODEL_AXIS): q/k/v + fused qkv, mlp_in,
# adaln.  Row-parallel (input dim over MODEL_AXIS; output replicated, so
# scales and biases replicate): out_proj, mlp_out.
_COL_PAT = re.compile(
    r"blocks/(attn/(qkv_proj|q_proj|k_proj|v_proj)|mlp_in|adaln)(/|$)"
)
_ROW_PAT = re.compile(r"blocks/(attn/out_proj|mlp_out)(/|$)")


def _spec_for(path: str, ndim: int) -> P:
    leaf = path.rsplit("/", 1)[-1]
    if _COL_PAT.search(path):
        if leaf in ("kernel", "kernel_q", "kernel_scale"):
            # [depth, K(or 1), N] — shard the output column dim.
            spec = P(None, None, MODEL_AXIS)
        elif leaf == "bias":
            spec = P(None, MODEL_AXIS)
        else:
            return P()
    elif _ROW_PAT.search(path):
        if leaf in ("kernel", "kernel_q"):
            # [depth, K, N] — megatron row split over the input dim; the
            # partial outputs are psum'd by GSPMD.
            spec = P(None, MODEL_AXIS, None)
        else:
            # kernel_scale [depth, 1, N] / bias [depth, N]: per-OUTPUT
            # column, and the output dim is unsharded here -> replicate.
            # (Sharding the size-1 scale dim crashes placement — the
            # round-2 int8_static TP bug.)
            return P()
    else:
        return P()  # patch embed, t-MLP, final layer: replicated
    if len(spec) == ndim:
        return spec
    # Rule written for the scanned (stacked) layout; drop the leading depth
    # axis for unstacked params.
    if len(spec) == ndim + 1 and spec[0] is None:
        return P(*spec[1:])
    return P()


def _divisible(spec: P, shape, mesh: Mesh) -> bool:
    """Every sharded dim must divide by its mesh-axis size (a model width
    that doesn't divide falls back to replication rather than crashing
    placement)."""
    for dim, ax in zip(shape, spec):
        if ax is not None and (dim == 0 or dim % mesh.shape[ax] != 0):
            return False
    return True


def param_shardings(mesh: Mesh, params):
    """Map a DiT param pytree to NamedShardings per the TP rules."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in kp
        )

    specs = {}
    for kp, leaf in flat:
        spec = _spec_for(path_str(kp), np.ndim(leaf))
        if not _divisible(spec, np.shape(leaf), mesh):
            spec = P()
        specs[jax.tree_util.keystr(kp)] = NamedSharding(mesh, spec)

    def lookup(kp, leaf):
        return specs[jax.tree_util.keystr(kp)]

    return jax.tree_util.tree_map_with_path(lookup, params)


def opt_state_shardings(mesh: Mesh, opt_state):
    """ZeRO-1-style sharding of optimizer moments over the data axis.

    Each array leaf whose leading dim divides by the data-axis size is
    sharded on that dim; GSPMD inserts the all-gather when the update is
    applied.  (The reference replicates optimizer state per GPU, DDP-style;
    this cuts per-chip optimizer HBM by the data-parallel degree.)
    """
    data_size = mesh.shape[DATA_AXIS]

    def spec(leaf):
        shape = np.shape(leaf)
        if len(shape) >= 1 and shape[0] % data_size == 0 and shape[0] > 0:
            return NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (len(shape) - 1)))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, C] batches shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
