"""Multi-host (multi-process) training support.

The reference scales with one process per GPU + NCCL
(``setup_ddp``/``init_process_group``, train_ddp_v3mod2.py:426-447).  The
TPU equivalent spans *hosts*: ``jax.distributed.initialize`` joins every
process into one JAX runtime whose global device set covers the whole pod
slice (ICI) or multiple slices (DCN); a single ``Mesh`` is laid out over
all global devices and the jitted train step runs SPMD — XLA places
gradient reductions on ICI within a slice and DCN across slices.

What each process owns:

- its local devices (e.g. 4 chips of a v5e-8 host),
- its *shard of every global batch*: ``process_batch_slice`` carves the
  deterministic global index order (identical on every host — crops and
  shuffles are pure functions of (seed, epoch, idx)) into contiguous
  per-process spans, and ``put_global_batch`` assembles the global array
  via ``jax.make_array_from_process_local_data``.

Checkpointing: every process calls Orbax save (it coordinates internally);
run-dir naming must be identical across hosts — ``shared_run_name``
broadcasts process 0's timestamp.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from .mesh import batch_sharding


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join the multi-process JAX runtime.

    On Cloud TPU pods the arguments auto-detect from the metadata server —
    call with no arguments.  For manual clusters (tests, CPU rehearsal,
    on-prem), pass coordinator/count/id or set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID.  No-op if already initialized or if
    nothing indicates a multi-process launch.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod: initialize() self-detects; elsewhere this is a
        # single-process run and there is nothing to join.  Partial pod
        # metadata (e.g. a tunnelled single chip advertising
        # TPU_WORKER_HOSTNAMES) must not abort a single-process run.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            try:
                jax.distributed.initialize()
            except ValueError as e:
                print(f"[distributed] auto-init unavailable ({e}); "
                      "continuing single-process")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_batch_slice(global_batch: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """This process's contiguous span of the global batch.

    Every host computes the same global sample-index order (crops/shuffles
    are pure functions of (seed, epoch, idx)); host ``p`` materialises rows
    ``[p*B/P, (p+1)*B/P)`` only.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} must divide by process count {n}"
        )
    per = global_batch // n
    return slice(p * per, (p + 1) * per)


def put_global_batch(mesh, *locals_: np.ndarray,
                     global_batch: Optional[int] = None) -> Tuple:
    """Per-process local rows [B/P, ...] -> global sharded arrays [B, ...].

    Single-process: plain device_put with the batch sharding.  Multi-host:
    ``jax.make_array_from_process_local_data`` stitches each host's rows
    into one global jax.Array laid out over the ``data`` mesh axis without
    any cross-host transfer of the data itself.
    """
    sharding = batch_sharding(mesh)
    n = jax.process_count()
    out = []
    for x in locals_:
        if n == 1:
            out.append(jax.device_put(x, sharding))
        else:
            gb = global_batch or x.shape[0] * n
            out.append(
                jax.make_array_from_process_local_data(
                    sharding, np.asarray(x), (gb,) + tuple(x.shape[1:])
                )
            )
    return tuple(out)


def shared_run_name(name: str) -> str:
    """Broadcast process 0's run-dir name so all hosts write one run.

    Timestamp names (MMDDHHMM) can differ across hosts by a tick; encode
    process 0's name as bytes and broadcast it.
    """
    if jax.process_count() == 1:
        return name
    from jax.experimental import multihost_utils

    buf = np.zeros(64, np.uint8)
    raw = name.encode()[:64]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def is_primary() -> bool:
    return jax.process_index() == 0
