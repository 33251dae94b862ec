"""Worker for the 2-process CPU-cluster multihost test (test_multihost.py).

Each process: joins the jax.distributed runtime (2 procs x 4 virtual CPU
devices = 8 global devices), builds a Trainer over an (8, 1) global mesh,
trains one epoch of the tiny dataset, and writes its view of the results
(first local batch hash, final param checksum) for the parent test to
cross-check.

Usage: python multihost_worker.py <coordinator> <n_procs> <pid> <workdir>
"""

import json
import sys
import zlib
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    coordinator, n_procs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
    )
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from jatsr_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator_address=coordinator,
                     num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == 4 * n_procs

    import dataclasses

    import numpy as np

    from jatsr_tpu.configs import get_preset
    from jatsr_tpu.parallel import make_mesh
    from jatsr_tpu.train.loop import Trainer

    C = 32
    p = get_preset("tiny")
    preset = dataclasses.replace(
        p,
        model=dataclasses.replace(p.model, input_channels=C, cond_channels=C),
        train=dataclasses.replace(
            p.train, batch_size=8, save_dir_base=str(workdir / "ckpt"),
            log_dir_base=str(workdir / "runs"), save_interval_steps=0,
            num_epochs=1, warmup_steps=2, lr=1e-3,
        ),
        data=dataclasses.replace(
            p.data, target_duration=64 * 512 / 44100,
            samples_per_epoch_multiplier=4,
        ),
    )
    mesh = make_mesh(8, 1)
    tr = Trainer(preset, data_dir=str(workdir / "data"), mesh=mesh,
                 run_name="12121212", writer=False)
    tr.writer = None

    # Record the local span of the first global batch: processes must see
    # DIFFERENT rows (the DistributedSampler contract).
    tr.train_loader.set_epoch(0)
    hr0, lr0 = next(iter(
        type(tr.train_loader)(tr.train_loader.ds, 8, shuffle=True,
                              seed=preset.train.seed, prefetch=0,
                              shard=(pid, n_procs))
    ))
    batch_hash = zlib.crc32(np.asarray(hr0).tobytes())

    best = tr.fit(verbose=False)

    # Param checksum: replicated params must be identical across processes.
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    flat = np.concatenate([
        np.asarray(jax.device_get(l)).ravel()[:128] for l in leaves
    ])
    (workdir / f"result_{pid}.json").write_text(json.dumps({
        "batch_hash": int(batch_hash),
        "param_sum": float(np.float64(flat).sum()),
        "best_val": float(best),
        "step": int(tr.state.step),
        "n_local_rows": int(np.asarray(hr0).shape[0]),
    }))
    print(f"[worker {pid}] ok")


if __name__ == "__main__":
    main()
