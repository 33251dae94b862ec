"""Multi-host training path (parallel/distributed.py).

Unit tests of the host-shard index math plus a REAL 2-process CPU cluster
(jax.distributed over localhost, 2 procs x 4 virtual devices = 8 global):
one epoch of sharded training must leave identical replicated params on
both processes while each fed different batch rows.  This is the TPU
equivalent of the reference's torchrun+NCCL DDP launch
(train_ddp_v3mod2.py:426-447) rehearsed on CPU.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from jatsr_tpu.data import BatchLoader, LatentDataset
from jatsr_tpu.parallel.distributed import process_batch_slice

HERE = Path(__file__).parent


def test_process_batch_slice_math():
    assert process_batch_slice(8, 0, 2) == slice(0, 4)
    assert process_batch_slice(8, 1, 2) == slice(4, 8)
    assert process_batch_slice(12, 2, 3) == slice(8, 12)
    with pytest.raises(ValueError, match="divide"):
        process_batch_slice(10, 0, 4)


def _mini_dataset(root: Path, n_songs=4, frames=120, C=32):
    rs = np.random.RandomState(0)
    for split, count in [("train", n_songs), ("val", 2)]:
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            hr = rs.randn(frames, C).astype(np.float16)
            lr = (0.8 * hr + 0.1 * rs.randn(frames, C)).astype(np.float16)
            np.save(d / f"s{i}.hr.npy", hr)
            np.save(d / f"s{i}.lr.npy", lr)
    stats = {
        "hr_mean": [0.0] * C, "hr_std": [1.0] * C,
        "lr_mean": [0.0] * C, "lr_std": [1.0] * C, "total_frames": 1,
    }
    (root / "global_stats_separated.json").write_text(json.dumps(stats))


def test_sharded_loader_partitions_each_batch(tmp_path):
    """Concatenating both shards of a batch reproduces the unsharded batch
    exactly (same epoch order, disjoint halves)."""
    _mini_dataset(tmp_path / "data")
    ds = LatentDataset(str(tmp_path / "data"), "train", 64, 2, seed=3)
    full = BatchLoader(ds, 4, shuffle=True, seed=3, prefetch=0)
    s0 = BatchLoader(ds, 4, shuffle=True, seed=3, prefetch=0, shard=(0, 2))
    s1 = BatchLoader(ds, 4, shuffle=True, seed=3, prefetch=0, shard=(1, 2))
    for loader in (full, s0, s1):
        loader.set_epoch(1)
    for (hf, _), (h0, _), (h1, _) in zip(full, s0, s1):
        assert h0.shape[0] == 2 and h1.shape[0] == 2
        np.testing.assert_array_equal(np.concatenate([h0, h1]), hf)


def test_sharded_loader_rejects_bad_config(tmp_path):
    _mini_dataset(tmp_path / "data")
    ds = LatentDataset(str(tmp_path / "data"), "train", 64, 2)
    with pytest.raises(ValueError, match="divide"):
        BatchLoader(ds, 5, shard=(0, 2))
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(ds, 4, drop_last=False, shard=(0, 2))


@pytest.mark.slow_multihost
def test_two_process_cpu_cluster(tmp_path):
    """End-to-end: 2 jax processes train one epoch over a shared (8,1) mesh."""
    _mini_dataset(tmp_path / "data")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "multihost_worker.py"),
             coordinator, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    r0 = json.loads((tmp_path / "result_0.json").read_text())
    r1 = json.loads((tmp_path / "result_1.json").read_text())
    # different data rows per host ...
    assert r0["batch_hash"] != r1["batch_hash"]
    assert r0["n_local_rows"] == r1["n_local_rows"] == 4
    # ... same replicated model afterwards
    assert r0["param_sum"] == pytest.approx(r1["param_sum"], rel=1e-6)
    assert r0["step"] == r1["step"] > 0
    assert np.isfinite(r0["best_val"])
    # only one meta sidecar chain (primary-only writes)
    run_dir = tmp_path / "ckpt" / "tiny" / "12121212"
    assert (run_dir / "last.meta.json").exists()
