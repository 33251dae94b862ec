"""End-to-end data pipeline tests: WAV -> chunk -> LR-sim -> encode ->
fp16 latents + stats + resume log (ref prepare_dataset_v5.py), and the
dataset/loader crop semantics (ref train_ddp_v3mod2.py:476-597)."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from jatsr_tpu.configs import DataConfig
from jatsr_tpu.data import (
    BatchLoader,
    LatentDataset,
    PreprocessPipeline,
    ValidationDataset,
    compute_separated_stats,
    load_stats,
)
from jatsr_tpu.models.dac import DAC, DACConfig
from jatsr_tpu.utils import load_wav, save_wav

CODEC_CFG = DACConfig(
    encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16, decoder_rates=(4, 2),
    n_codebooks=2, codebook_size=16, codebook_dim=4,
)
DATA_CFG = DataConfig(
    high_sr=8000, low_sr=4000, dac_sample_rate=8000,
    chunk_duration=0.5, overlap_duration=0.1, min_duration=0.2,
    val_ratio=0.5,
)


def _make_wavs(d: Path, n=4, sr=8000):
    d.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        secs = 0.8 + 0.4 * i
        t = np.arange(int(sr * secs)) / sr
        audio = 0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        audio += 0.05 * rs.randn(len(t))
        save_wav(d / f"song_{i}.wav", audio.astype(np.float32), sr)
    # one too-short file that must be skipped
    save_wav(d / "short.wav", np.zeros(800, np.float32), sr)


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    src = tmp_path_factory.mktemp("src")
    out = tmp_path_factory.mktemp("out")
    _make_wavs(src)
    codec = DAC.random_init(0, CODEC_CFG)
    pipe = PreprocessPipeline(codec, DATA_CFG, str(out))
    counts = pipe.run([str(src)], verbose=False)
    return out, counts, codec


def test_pipeline_counts_and_outputs(pipeline_out):
    out, counts, _ = pipeline_out
    assert counts["done"] == 4
    assert counts["skipped"] == 1
    n_train = len(list((out / "train").glob("*.hr.npy")))
    n_val = len(list((out / "val").glob("*.hr.npy")))
    assert n_train + n_val == 4 and n_val >= 1
    assert (out / "global_stats.json").exists()
    assert (out / "global_stats_separated.json").exists()


def test_latents_are_fp16_time_major(pipeline_out):
    out, _, codec = pipeline_out
    f = next((out / "train").glob("*.hr.npy"))
    hr = np.load(f)
    assert hr.dtype == np.float16
    assert hr.shape[1] == codec.cfg.latent_dim
    meta = json.loads(Path(str(f).replace(".hr.npy", ".meta.json")).read_text())
    assert meta["frames"] == hr.shape[0]
    # frame count ~ duration * sr / hop
    expect = meta["duration"] * DATA_CFG.high_sr / codec.cfg.hop_length
    assert abs(hr.shape[0] - expect) <= 2


def test_resume_skips_done(pipeline_out):
    out, _, codec = pipeline_out
    pipe = PreprocessPipeline(DAC.random_init(0, CODEC_CFG), DATA_CFG, str(out))
    assert len(pipe.processed_set()) == 4


def test_stats_sane(pipeline_out):
    out, _, _ = pipeline_out
    hm, hs, lm, ls = load_stats(str(out / "global_stats_separated.json"))
    assert hm.shape == (CODEC_CFG.latent_dim,)
    assert np.all(hs > 0) and np.all(ls > 0)
    # second-pass recompute must agree with the single-pass accumulation
    # over the train split subset of what it saw
    stats2 = compute_separated_stats(str(out), splits=("train", "val"))
    np.testing.assert_allclose(np.asarray(stats2["hr_mean"]), hm, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats2["hr_std"]), hs, atol=1e-4)


def test_dataset_crops(pipeline_out):
    out, _, _ = pipeline_out
    target = 40
    ds = LatentDataset(str(out), "train", target_frames=target, multiplier=3)
    assert len(ds) == 3 * len(ds.store)
    hr, lr = ds[0]
    assert hr.shape == (target, CODEC_CFG.latent_dim)
    assert hr.dtype == np.float32

    # loop-padding: ask for more frames than any song has
    big = LatentDataset(str(out), "train", target_frames=5000, multiplier=1)
    hr2, _ = big[0]
    assert hr2.shape[0] == 5000


def test_validation_deterministic(pipeline_out):
    out, _, _ = pipeline_out
    ds = ValidationDataset(str(out), "val", target_frames=30, multiplier=3)
    a1, _ = ds[1]
    a2, _ = ds[1]
    np.testing.assert_array_equal(a1, a2)


def test_batch_loader(pipeline_out):
    out, _, _ = pipeline_out
    ds = LatentDataset(str(out), "train", target_frames=32, multiplier=4)
    loader = BatchLoader(ds, batch_size=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    hr, lr = batches[0]
    assert hr.shape == (2, 32, CODEC_CFG.latent_dim)
    # epoch reshuffle changes order
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not all(
        np.array_equal(a[0], b[0]) for a, b in zip(batches, batches2)
    )


def test_sharded_preprocessing_covers_all(tmp_path):
    """Multi-host sharding: two shard runs into separate dirs together
    process every file exactly once."""
    src = tmp_path / "src"
    _make_wavs(src, n=4)
    outs = []
    for idx in range(2):
        out = tmp_path / f"out{idx}"
        codec = DAC.random_init(0, CODEC_CFG)
        pipe = PreprocessPipeline(codec, DATA_CFG, str(out))
        counts = pipe.run([str(src)], verbose=False, num_shards=2,
                          shard_index=idx)
        outs.append((out, counts))
    done = sum(c["done"] + c["skipped"] for _, c in outs)
    assert done == 5  # 4 songs + 1 skipped short file
    names = set()
    for out, _ in outs:
        for split in ("train", "val"):
            names |= {p.name for p in (out / split).glob("*.hr.npy")}
    assert len(names) == 4


def test_batch_loader_keep_last(pipeline_out):
    out, _, _ = pipeline_out
    ds = LatentDataset(str(out), "train", target_frames=16, multiplier=3)
    n = len(ds)
    loader = BatchLoader(ds, batch_size=4, drop_last=False, shuffle=False,
                         prefetch=0)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == n
    if n % 4:
        assert batches[-1][0].shape[0] == n % 4


def test_plain_chunking_v3_mode(tmp_path):
    """chunking="plain" (the v3 generation, scripts/prepare_dataset_v3.py:
    44,74-110): fixed windows, NO context frames — same frame count as the
    overlap pipeline (both clamp to n_samples/hop), different windowing."""
    src = tmp_path / "src"
    _make_wavs(src, n=2)
    codec = DAC.random_init(0, CODEC_CFG)
    cfg = dataclasses.replace(DATA_CFG, chunking="plain",
                              overlap_duration=0.0)
    pipe = PreprocessPipeline(codec, cfg, str(tmp_path / "out"))
    counts = pipe.run([str(src)], verbose=False)
    assert counts["done"] == 2
    assert pipe._overlap_samples == 0
    assert pipe._win_samples == pipe._valid_samples
    for split in ("train", "val"):
        for hr_path in (tmp_path / "out" / split).glob("*.hr.npy"):
            meta = json.loads(Path(
                str(hr_path).replace(".hr.npy", ".meta.json")).read_text())
            hr = np.load(hr_path)
            assert hr.shape[0] == meta["frames"] > 0


def test_whole_song_v2_mode(tmp_path):
    """chunking="whole" (the v2 generation, scripts/prepare_dataset_v2.py:
    whole songs, one file each) matches the frame count of the chunked
    pipeline and produces finite latents."""
    src = tmp_path / "src"
    _make_wavs(src, n=2)
    codec = DAC.random_init(0, CODEC_CFG)
    from jatsr_tpu.configs import data_preset

    assert data_preset("v2").chunking == "whole"
    cfg = dataclasses.replace(DATA_CFG, chunking="whole")
    pipe = PreprocessPipeline(codec, cfg, str(tmp_path / "out"))
    counts = pipe.run([str(src)], verbose=False)
    assert counts["done"] == 2
    found = 0
    for split in ("train", "val"):
        for hr_path in (tmp_path / "out" / split).glob("*.hr.npy"):
            meta = json.loads(Path(
                str(hr_path).replace(".hr.npy", ".meta.json")).read_text())
            hr = np.load(hr_path)
            # frames = n_samples_at_high_sr / hop48 (pow2 padding trimmed)
            assert hr.shape[0] == meta["frames"] > 0
            assert np.isfinite(hr.astype(np.float32)).all()
            found += 1
    assert found == 2


def test_normalize_stored_latents_v2_pass2(tmp_path):
    """v2's PASS 2 (scripts/prepare_dataset_v2.py:621-732): latents are
    rewritten as (z - mean)/std with SCALAR separated stats; the emitted
    stats files become identity so downstream Normalizer is a no-op."""
    src = tmp_path / "src"
    _make_wavs(src, n=2)
    codec = DAC.random_init(0, CODEC_CFG)
    out = tmp_path / "out"
    pipe = PreprocessPipeline(codec, DATA_CFG, str(out))
    pipe.run([str(src)], verbose=False)
    pre = {}
    for split in ("train", "val"):
        for p in (out / split).glob("*.hr.npy"):
            pre[str(p)] = np.load(p).astype(np.float32)
    s = pipe.acc.scalar_separated_stats()
    n = pipe.normalize_stored_latents(verbose=False)
    assert n == 2
    for path, raw in pre.items():
        post = np.load(path).astype(np.float32)
        expect = ((raw - s["hr_mean"]) / s["hr_std"]).astype(np.float16)
        np.testing.assert_allclose(post, expect.astype(np.float32),
                                   atol=1e-3)
        meta = json.loads(Path(
            path.replace(".hr.npy", ".meta.json")).read_text())
        assert meta["normalized"] is True
    stats = json.loads((out / "global_stats_separated.json").read_text())
    assert stats["normalized_storage"] is True
    assert np.allclose(stats["hr_mean"], 0.0)
    assert np.allclose(stats["hr_std"], 1.0)
    assert (out / "global_stats_prenorm.json").exists()


def test_multi_device_encode_matches_single(tmp_path):
    """devices=... round-robin encode with deferred fetches (the
    reference's per-GPU worker pool as concurrent jit dispatch,
    prepare_dataset_v5.py:326-381) produces byte-identical latents and
    stats to the single-device pipeline."""
    import jax

    src = tmp_path / "src"
    _make_wavs(src, n=4)
    codec = DAC.random_init(0, CODEC_CFG)
    out1, outN = tmp_path / "out1", tmp_path / "outN"
    c1 = PreprocessPipeline(codec, DATA_CFG, str(out1)).run(
        [str(src)], verbose=False)
    pipeN = PreprocessPipeline(codec, DATA_CFG, str(outN),
                               devices=jax.devices()[:4])
    cN = pipeN.run([str(src)], verbose=False)
    assert c1 == cN
    names = sorted(p.name for split in ("train", "val")
                   for p in (out1 / split).glob("*.npy"))
    assert names
    for split in ("train", "val"):
        for p in (out1 / split).glob("*.npy"):
            a = np.load(p)
            b = np.load(outN / split / p.name)
            np.testing.assert_array_equal(a, b)
    s1 = json.loads((out1 / "global_stats_separated.json").read_text())
    sN = json.loads((outN / "global_stats_separated.json").read_text())
    assert s1 == sN
