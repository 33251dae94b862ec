"""Native C++ latent loader: builds, mmaps npy shards, and reproduces the
Python crop/loop semantics bit-exactly."""

import numpy as np
import pytest

from jatsr_tpu.data import LatentDataset
from jatsr_tpu.data.native_loader import (
    NativeLatentStore,
    build_error,
    is_available,
)

pytestmark = pytest.mark.skipif(
    not is_available(), reason=f"native loader unavailable: {build_error()}"
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards") / "train"
    d.mkdir()
    rs = np.random.RandomState(0)
    frames = [50, 120, 17]  # one shorter than the crop target
    for i, f in enumerate(frames):
        hr = rs.randn(f, 16).astype(np.float16)
        lr = rs.randn(f, 16).astype(np.float16)
        np.save(d / f"s{i}.hr.npy", hr)
        np.save(d / f"s{i}.lr.npy", lr)
    return d


def test_open_and_metadata(shard_dir):
    paths = sorted(str(p) for p in shard_dir.glob("*.hr.npy"))
    store = NativeLatentStore(paths)
    assert store.n_files == 3
    assert store.channels == 16
    assert sorted(store.frames) == [17, 50, 120]
    store.close()


def test_matches_python_loader(shard_dir):
    paths = sorted(str(p) for p in shard_dir.glob("*.hr.npy"))
    store = NativeLatentStore(paths)
    target = 30
    ds = LatentDataset(str(shard_dir.parent), "train", target_frames=target,
                       multiplier=1)
    # same files in same sorted order
    assert [str(p) for p in ds.store.files] == paths

    idx = np.array([0, 1, 2, 1], np.int64)
    starts = []
    for i in idx:
        f = store.frames[i]
        starts.append(0 if f < target else min(5, f - target))
    starts = np.asarray(starts, np.int64)
    hr_n, lr_n = store.fill_batch(idx, starts, target)

    for b, (i, s) in enumerate(zip(idx, starts)):
        hr_mm, lr_mm = ds.store.get(int(i))
        from jatsr_tpu.data.dataset import _crop_or_loop

        hr_p, lr_p = _crop_or_loop(hr_mm, lr_mm, int(s), target)
        np.testing.assert_array_equal(hr_n[b], hr_p)
        np.testing.assert_array_equal(lr_n[b], lr_p)
    store.close()


def test_fp16_specials(tmp_path):
    """Subnormals, inf, nan, -0 convert exactly."""
    d = tmp_path / "train"
    d.mkdir()
    vals = np.array(
        [0.0, -0.0, 1.0, -2.5, 6.1e-5, 5.96e-8, np.inf, -np.inf, np.nan,
         65504.0, -65504.0, 3.14159],
        np.float16,
    )
    arr = np.tile(vals, (4, 1)).astype(np.float16)
    np.save(d / "x.hr.npy", arr)
    np.save(d / "x.lr.npy", arr)
    store = NativeLatentStore([str(d / "x.hr.npy")])
    hr, _ = store.fill_batch(np.zeros(1, np.int64), np.zeros(1, np.int64), 4)
    np.testing.assert_array_equal(hr[0], arr.astype(np.float32))
    store.close()


def test_bad_index_errors(shard_dir):
    paths = sorted(str(p) for p in shard_dir.glob("*.hr.npy"))
    store = NativeLatentStore(paths)
    with pytest.raises(RuntimeError):
        store.fill_batch(np.array([99], np.int64), np.zeros(1, np.int64), 10)
    with pytest.raises(RuntimeError):
        # out-of-range start on a long-enough song
        long_idx = int(np.argmax(store.frames))
        store.fill_batch(np.array([long_idx], np.int64),
                         np.array([10_000], np.int64), 10)
    store.close()


def test_batch_loader_native_path(shard_dir):
    from jatsr_tpu.data import BatchLoader

    ds_py = LatentDataset(str(shard_dir.parent), "train", target_frames=30,
                          multiplier=2, seed=7)
    ds_nat = LatentDataset(str(shard_dir.parent), "train", target_frames=30,
                           multiplier=2, seed=7)
    a = list(BatchLoader(ds_py, 2, shuffle=True, seed=3, prefetch=0))
    b = list(BatchLoader(ds_nat, 2, shuffle=True, seed=3, prefetch=0,
                         native=True))
    assert len(a) == len(b)
    for (hr1, lr1), (hr2, lr2) in zip(a, b):
        np.testing.assert_array_equal(hr1, hr2)
        np.testing.assert_array_equal(lr1, lr2)
