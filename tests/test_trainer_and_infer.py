"""Trainer (loop + orbax checkpoint/auto-resume) and chunked inference tests.

Mirrors the reference's resume semantics (train_ddp_v3mod2.py:603-660) and
the chunk/crossfade pipeline (infer_test_v3m2.py:339-406), plus the
destructive checkpoint check (tests/test_dac_overfit_v2_destructive.py):
restoring must actually change the params."""

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jatsr_tpu.configs import SamplerConfig, get_preset
from jatsr_tpu.infer import InferencePipeline, chunk_plan, crossfade_chunks
from jatsr_tpu.models import DiT
from jatsr_tpu.train.checkpoint import CheckpointManager, find_latest_run
from jatsr_tpu.train.loop import Trainer
from jatsr_tpu.train.step import Normalizer

C = 32  # small latent width for speed


def _mini_dataset(root: Path, n_songs=3, frames=120):
    rs = np.random.RandomState(0)
    for split, count in [("train", n_songs), ("val", 2)]:
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            hr = rs.randn(frames, C).astype(np.float16)
            lr = (0.8 * hr + 0.1 * rs.randn(frames, C)).astype(np.float16)
            np.save(d / f"s{i}.hr.npy", hr)
            np.save(d / f"s{i}.lr.npy", lr)
            (d / f"s{i}.meta.json").write_text(json.dumps({"frames": frames}))
    stats = {
        "hr_mean": [0.0] * C, "hr_std": [1.0] * C,
        "lr_mean": [0.0] * C, "lr_std": [1.0] * C, "total_frames": 1,
    }
    (root / "global_stats_separated.json").write_text(json.dumps(stats))


def _preset(tmp: Path):
    p = get_preset("tiny")
    return dataclasses.replace(
        p,
        model=dataclasses.replace(p.model, input_channels=C, cond_channels=C),
        train=dataclasses.replace(
            p.train, batch_size=2, save_dir_base=str(tmp / "ckpt"),
            log_dir_base=str(tmp / "runs"), save_interval_steps=0,
            num_epochs=2, warmup_steps=5, lr=1e-3,
        ),
        data=dataclasses.replace(
            p.data, target_duration=64 * 512 / 44100,  # 64 frames
            samples_per_epoch_multiplier=2,
        ),
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trainer")
    _mini_dataset(tmp / "data")
    preset = _preset(tmp)
    tr = Trainer(preset, data_dir=str(tmp / "data"), run_name="11112222",
                 writer=False)
    tr.writer = None
    best = tr.fit(verbose=False)
    return tmp, preset, tr, best


def test_trainer_runs_and_checkpoints(trained):
    tmp, preset, tr, best = trained
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "11112222"
    assert (run_dir / "last").exists()
    assert (run_dir / "best").exists()
    assert np.isfinite(best)
    assert int(tr.state.step) == 2 * len(tr.train_loader)


def test_auto_resume_continues(trained):
    tmp, preset, tr, _ = trained
    preset2 = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, num_epochs=3)
    )
    tr2 = Trainer(preset2, data_dir=str(tmp / "data"), resume="auto",
                  writer=False)
    tr2.writer = None
    assert tr2.start_epoch == 2
    assert int(tr2.state.step) == int(tr.state.step)
    tr2.fit(verbose=False)
    assert int(tr2.state.step) == 3 * len(tr2.train_loader)


def test_restore_actually_loads_weights(trained):
    """Destructive control: fresh-initialised params differ from the
    checkpoint; after restore they match the trained state exactly."""
    tmp, preset, tr, _ = trained
    fresh = Trainer(preset, data_dir=str(tmp / "data"), run_name="99999999",
                    writer=False)
    fresh.writer = None
    # pick a leaf the optimiser actually moves (biases start at 0 both times)
    leaves = {
        jax.tree_util.keystr(kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(fresh.state.params)[0]
    }
    key = next(k for k in leaves if "patch_in" in k and "kernel" in k)
    fresh_leaf = leaves[key]
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "11112222"
    restored, meta = CheckpointManager(run_dir).restore("last", fresh.state)
    restored_leaves = {
        jax.tree_util.keystr(kp): np.asarray(v)
        for kp, v in jax.tree_util.tree_flatten_with_path(restored.params)[0]
    }
    # restore replaced the fresh init (the destructive control: if these were
    # equal, checkpoint loading would be a no-op)
    assert not np.allclose(restored_leaves[key], fresh_leaf)
    assert int(restored.step) == meta["global_step"] > 0
    # determinism: a second restore yields identical weights
    again, _ = CheckpointManager(run_dir).restore("last", fresh.state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(again.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
    )


def test_find_latest_run(trained):
    tmp, preset, *_ = trained
    base = Path(preset.train.save_dir_base) / "tiny"
    latest = find_latest_run(str(base))
    assert latest is not None and latest.name == "11112222"


# --- chunked inference ---------------------------------------------------


def test_chunk_plan_coverage():
    plan = chunk_plan(5000, 1378, 172)
    assert plan[0] == (0, 1378)
    assert plan[-1][1] == 5000
    for (s1, e1), (s2, e2) in zip(plan, plan[1:]):
        assert s2 == s1 + 1378 - 172  # stride
        assert s2 < e1  # overlap exists
    assert chunk_plan(100, 1378, 172) == [(0, 100)]


def test_crossfade_constant_signal_preserved():
    a = np.ones((50, 4), np.float32)
    b = np.ones((50, 4), np.float32)
    out = crossfade_chunks([a, b], 10)
    assert out.shape == (90, 4)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_pipeline_long_latent(trained):
    tmp, preset, tr, _ = trained
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(
        num_steps=4,
        chunk_duration=64 * 512 / 44100,  # 64-frame chunks
        overlap_duration=16 * 512 / 44100,  # 16-frame overlap
    )
    pipe = InferencePipeline(tr.model, tr.state.params, norm,
                             sampler_cfg=scfg)
    assert pipe.chunk_frames == 64 and pipe.overlap_frames == 16
    lr_latent = np.random.RandomState(0).randn(150, C).astype(np.float32)
    out = pipe.super_resolve_latent(lr_latent, jax.random.PRNGKey(0))
    assert out.shape == (150, C)
    assert np.isfinite(out).all()
    # CFG path with chunk grouping
    out2 = pipe.super_resolve_latent(lr_latent, cfg_scale=2.0, max_batch=2)
    assert out2.shape == (150, C)


def test_interleaved_sample_decode_matches_two_phase(trained):
    """super_resolve_latent_to_audio (VERDICT r3 #1b: decode segments of
    chunk-group i enqueued before group i+1 samples) must reproduce the
    two-phase decode_latent(super_resolve_latent_device(...)) EXACTLY —
    same crossfade arithmetic, same anchored decode windows."""
    from jatsr_tpu.models.dac import DAC, DACConfig

    tmp, preset, tr, _ = trained
    tiny = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                     decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                     codebook_dim=4)
    codec = DAC.random_init(3, cfg=tiny)
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(num_steps=3,
                         chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    pipe = InferencePipeline(tr.model, tr.state.params, norm, codec=codec,
                             sampler_cfg=scfg, hop_length=8)
    lr_latent = np.random.RandomState(2).randn(400, C).astype(np.float32)

    # Two-phase reference (small segments so several decode windows fire,
    # incl. the anchored final one).
    gen = pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=2)
    want = pipe.decode_latent(gen, segment_frames=100, ctx_frames=12)

    got = pipe.super_resolve_latent_to_audio(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=2,
        segment_frames=100, ctx_frames=12)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)

    # Single-group path (max_batch=0) must also agree with itself split.
    got1 = pipe.super_resolve_latent_to_audio(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=0,
        segment_frames=100, ctx_frames=12)
    gen1 = pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=0)
    want1 = pipe.decode_latent(gen1, segment_frames=100, ctx_frames=12)
    np.testing.assert_array_equal(got1, want1)


def test_pipeline_multichip_mesh(trained):
    """Sampler data-parallel over the virtual mesh must match single-device
    output (same keys, same chunks)."""
    from jatsr_tpu.parallel import make_mesh

    tmp, preset, tr, _ = trained
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(num_steps=3, chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    lr_latent = np.random.RandomState(1).randn(150, C).astype(np.float32)
    pipe1 = InferencePipeline(tr.model, tr.state.params, norm,
                              sampler_cfg=scfg)
    out1 = pipe1.super_resolve_latent(lr_latent, jax.random.PRNGKey(7))
    pipe8 = InferencePipeline(tr.model, tr.state.params, norm,
                              sampler_cfg=scfg, mesh=make_mesh(4, 2))
    out8 = pipe8.super_resolve_latent(lr_latent, jax.random.PRNGKey(7))
    assert out8.shape == out1.shape
    # bf16 matmuls reduce in different orders under sharding; tolerance is
    # bf16-noise-sized, far below any semantic difference.
    np.testing.assert_allclose(out1, out8, atol=1e-3)


def test_pipeline_multichip_int8_serving(trained):
    """The PRODUCTION serving stack (int8_static + fused QKV + fused MLP +
    flash attention + bf16 scores — bench.py's defaults) must place and
    sample on a (4, 2) data x model mesh and match its own single-device
    output.  Round 2 shipped TP rules that crashed on ``kernel_scale``
    leaves (size-1 dim sharded) and silently replicated ``qkv_proj`` —
    this pins the fix (parallel/mesh.py)."""
    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops.quant import quantize_params_static
    from jatsr_tpu.parallel import make_mesh

    tmp, preset, tr, _ = trained
    mcfg = dataclasses.replace(
        preset.model, matmul_precision="int8_static", fused_qkv=True,
        fused_mlp=True, attention_impl="flash", scores_dtype="bfloat16",
        dropout=0.0, drop_path_rate=0.0,
    )
    model = DiT(mcfg)
    dummy = jnp.zeros((1, 8, C), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            dummy, jnp.zeros((1,), jnp.float32), dummy)["params"])
    qparams = quantize_params_static(tr.state.params, shapes)

    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(num_steps=3, chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    lr_latent = np.random.RandomState(2).randn(150, C).astype(np.float32)
    pipe1 = InferencePipeline(model, qparams, norm, sampler_cfg=scfg)
    out1 = pipe1.super_resolve_latent(lr_latent, jax.random.PRNGKey(9),
                                      cfg_scale=2.0)
    pipe8 = InferencePipeline(model, qparams, norm, sampler_cfg=scfg,
                              mesh=make_mesh(4, 2))
    out8 = pipe8.super_resolve_latent(lr_latent, jax.random.PRNGKey(9),
                                      cfg_scale=2.0)
    assert out8.shape == out1.shape
    assert np.isfinite(out8).all()
    # int8 x int8 contractions are exact, but the fp32 rescale/psum order
    # differs under TP sharding, and the ODE's 1/(1-t) velocity factor +
    # CFG extrapolation amplify that over the steps: measured max-abs
    # ~3e-3 on unit-scale outputs (structural breakage would be
    # output-scale ~1e-1).
    np.testing.assert_allclose(out1, out8, atol=2e-2)
    rel = np.linalg.norm(out8 - out1) / (np.linalg.norm(out1) + 1e-12)
    assert rel < 5e-2, rel


def test_param_shardings_int8_static_place(trained):
    """Every int8_static leaf must get a placeable spec on a (4, 2) mesh:
    scales follow their kernel's output-dim sharding, size-1 dims never
    shard, fused qkv_proj shards its output columns."""
    from jax.sharding import PartitionSpec as P

    from jatsr_tpu.models import DiT
    from jatsr_tpu.ops.quant import quantize_params_static
    from jatsr_tpu.parallel import make_mesh, param_shardings

    tmp, preset, tr, _ = trained
    mcfg = dataclasses.replace(
        preset.model, matmul_precision="int8_static", fused_qkv=True,
        fused_mlp=True, attention_impl="flash",
        dropout=0.0, drop_path_rate=0.0,
    )
    model = DiT(mcfg)
    dummy = jnp.zeros((1, 8, C), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)},
            dummy, jnp.zeros((1,), jnp.float32), dummy)["params"])
    qparams = quantize_params_static(tr.state.params, shapes)
    mesh = make_mesh(4, 2)
    sh = param_shardings(mesh, qparams)
    placed = jax.device_put(qparams, sh)  # round-2 bug: this raised
    jax.block_until_ready(placed)
    b = sh["blocks"]
    assert b["attn"]["qkv_proj"]["kernel_q"].spec == P(None, None, "model")
    assert b["attn"]["qkv_proj"]["kernel_scale"].spec == P(
        None, None, "model")
    assert b["attn"]["out_proj"]["kernel_q"].spec == P(None, "model", None)
    assert b["attn"]["out_proj"]["kernel_scale"].spec == P()
    assert b["mlp_in"]["kernel_scale"].spec == P(None, None, "model")
    assert b["mlp_out"]["kernel_scale"].spec == P()


def test_exact_resume_reproduces_training(tmp_path):
    """Bit-exact resume: train 4 epochs straight vs 2 epochs + restore +
    2 more — final params must be identical (the reference's 'Perfect
    Resume' contract, train_ddp_v3mod2.py:747-810, achieved here without
    checkpointing host RNG: crops and step RNG are stateless functions of
    (seed, epoch/step, idx))."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    p4 = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, num_epochs=4)
    )

    tr_full = Trainer(p4, data_dir=str(tmp_path / "data"),
                      run_name="20000000", writer=False)
    tr_full.writer = None
    tr_full.fit(verbose=False)

    p2 = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, num_epochs=2)
    )
    tr_a = Trainer(p2, data_dir=str(tmp_path / "data"),
                   run_name="30000000", writer=False)
    tr_a.writer = None
    tr_a.fit(verbose=False)
    tr_b = Trainer(p4, data_dir=str(tmp_path / "data"),
                   resume=str(Path(p4.train.save_dir_base) / "tiny" / "30000000"),
                   writer=False)
    tr_b.writer = None
    assert tr_b.start_epoch == 2
    tr_b.fit(verbose=False)

    la = jax.tree_util.tree_leaves(tr_full.state.params)
    lb = jax.tree_util.tree_leaves(tr_b.state.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_into_sharded_topology(trained):
    """A checkpoint saved single-device restores into a mesh-sharded
    trainer (cross-topology resume: single-host -> v5e-8 style)."""
    from jatsr_tpu.parallel import make_mesh

    tmp, preset, tr, _ = trained
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "11112222"
    mesh = make_mesh(4, 2)
    preset = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, batch_size=4)
    )  # batch must divide the data axis
    tr8 = Trainer(preset, data_dir=str(tmp / "data"), mesh=mesh,
                  resume=str(run_dir), writer=False)
    tr8.writer = None
    assert int(tr8.state.step) > 0
    # params carry the TP shardings after restore
    leaf = jax.tree_util.tree_leaves(tr8.state.params)[0]
    assert not leaf.sharding.is_fully_replicated or leaf.ndim == 1
    # and a step executes
    hr, lr = next(iter(tr8.train_loader))
    hr, lr = tr8._put_batch(hr, lr)
    s2, m = tr8.train_step(tr8.state, hr, lr)
    assert np.isfinite(float(m["loss"]))


def test_interval_checkpoints_pruned(tmp_path):
    """interval_<step> checkpoints are capped at keep_interval_checkpoints."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    preset = dataclasses.replace(
        preset, train=dataclasses.replace(
            preset.train, save_interval_steps=1, num_epochs=1,
            keep_interval_checkpoints=2,
        )
    )
    tr = Trainer(preset, data_dir=str(tmp_path / "data"),
                 run_name="44444444", writer=False)
    tr.writer = None
    tr.fit(verbose=False)
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "44444444"
    intervals = sorted(d.name for d in run_dir.iterdir()
                       if d.name.startswith("interval_") and d.is_dir())
    assert len(intervals) == 2
    steps = len(tr.train_loader)
    assert intervals == [f"interval_{steps - 1}", f"interval_{steps}"]


def test_restore_template_prng_shape_matches(trained):
    """Regression: checkpoints store the PRNG key (rbg = uint32[4]); a
    restore template built via create_train_state must come out under the
    same PRNG impl or orbax fails with a shape mismatch."""
    import jax.numpy as jnp
    from jatsr_tpu.train import create_train_state

    tmp, preset, tr, _ = trained
    dummy = jnp.zeros((1, 8, C), jnp.float32)
    template = create_train_state(DiT(preset.model), preset.train, 1,
                                  (dummy, dummy))
    assert template.rng.shape == tr.state.rng.shape
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "11112222"
    restored, _ = CheckpointManager(run_dir).restore("last", template)
    assert restored.rng.shape == tr.state.rng.shape


def test_restore_legacy_prng_checkpoint(tmp_path):
    """A checkpoint written under a different PRNG impl restores with a
    re-keyed rng (weights exact, warning printed) instead of failing."""
    import jax.numpy as jnp
    from jatsr_tpu.train import create_train_state

    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    tr = Trainer(preset, data_dir=str(tmp_path / "data"),
                 run_name="55555555", writer=False)
    tr.writer = None
    tr.fit(num_epochs=1, verbose=False)
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "55555555"

    # fabricate a template under the OTHER impl by swapping the key array
    template = tr.state
    other = (jnp.zeros((2,), jnp.uint32) if template.rng.shape[0] == 4
             else jnp.zeros((4,), jnp.uint32))
    mismatched = template.replace(rng=other)
    restored, _ = CheckpointManager(run_dir).restore("last", mismatched)
    assert restored.rng.shape == other.shape  # re-keyed under template impl
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]),
    )


def test_interrupt_saves_current_epoch(tmp_path):
    """An interrupt mid-epoch-2 must save `last` with epoch=1 (the last
    *completed* epoch) so resume continues at epoch 2 — not with
    start_epoch-1, which would replay every epoch of the session."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    p4 = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, num_epochs=4)
    )
    tr = Trainer(p4, data_dir=str(tmp_path / "data"), run_name="77777777",
                 writer=False)
    tr.writer = None
    steps_per_epoch = len(tr.train_loader)
    orig = tr.train_step
    calls = [0]

    def interrupting_step(state, hr, lr):
        calls[0] += 1
        if calls[0] == 2 * steps_per_epoch + 2:  # mid-epoch 2 (0-indexed)
            raise KeyboardInterrupt
        return orig(state, hr, lr)

    tr.train_step = interrupting_step
    with pytest.raises(KeyboardInterrupt):
        tr.fit(verbose=False)
    run_dir = Path(p4.train.save_dir_base) / "tiny" / "77777777"
    meta = json.loads((run_dir / "last.meta.json").read_text())
    assert meta["epoch"] == 1  # epochs 0 and 1 completed
    tr2 = Trainer(p4, data_dir=str(tmp_path / "data"), resume=str(run_dir),
                  writer=False)
    tr2.writer = None
    assert tr2.start_epoch == 2


def test_find_latest_run_skips_runs_without_last(tmp_path):
    """No run containing a `last` checkpoint -> None (fresh run dir), not a
    stale crashed-before-first-save dir."""
    base = tmp_path / "base"
    (base / "12345678").mkdir(parents=True)  # run dir, no `last`
    assert find_latest_run(str(base)) is None


def test_fit_epochs_override_rescales_lr_horizon(tmp_path):
    """fit(num_epochs=N) must re-anchor the warmup-cosine decay horizon to
    the effective run length, not the preset's num_epochs."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)  # num_epochs=2 in the preset
    tr = Trainer(preset, data_dir=str(tmp_path / "data"),
                 run_name="88888888", writer=False)
    tr.writer = None
    assert tr.total_steps == 2 * len(tr.train_loader)
    tr.fit(num_epochs=1, verbose=False)
    assert tr.total_steps == 1 * len(tr.train_loader)


def test_tail_chunk_padding_is_cfg_null(trained):
    """The short final chunk is padded AFTER normalization: the padding the
    model sees must be exactly 0 (the trained CFG null token), not
    (0 - lr_mean)/lr_std."""
    tmp, preset, tr, _ = trained
    norm = Normalizer(np.zeros(C), np.ones(C),
                      5.0 * np.ones(C), 2.0 * np.ones(C))  # nonzero LR stats
    scfg = SamplerConfig(num_steps=2, chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    pipe = InferencePipeline(tr.model, tr.state.params, norm,
                             sampler_cfg=scfg)
    captured = {}

    def spy_sampler(key, cond, num_steps=None, cfg_scale=None, z0=None):
        captured["cond"] = np.asarray(cond)
        return cond

    pipe.sampler = spy_sampler
    T = 100  # chunk 64, stride 48 -> chunks (0,64),(48,100): 2nd is 52 real
    pipe.super_resolve_latent(
        np.random.RandomState(0).randn(T, C).astype(np.float32))
    cond = captured["cond"]
    assert cond.shape[0] == 2
    np.testing.assert_array_equal(cond[1, 52:], 0.0)  # pad == null token
    assert np.abs(cond[1, :52]).mean() > 0.5  # real frames are normalized


def test_mesh_batch_divisibility_guard(tmp_path):
    from jatsr_tpu.parallel import make_mesh

    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)  # batch_size 2, data axis 4
    with pytest.raises(ValueError, match="divisible"):
        Trainer(preset, data_dir=str(tmp_path / "data"), mesh=make_mesh(4, 2),
                run_name="66666666", writer=False)


def test_save_last_cadence(tmp_path):
    """save_last_every_epochs=2: `last` lands on epochs 1 and 3 (and the
    final epoch always saves), `best` still tracks every improvement."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    preset = dataclasses.replace(
        preset, train=dataclasses.replace(
            preset.train, num_epochs=3, save_last_every_epochs=2,
        )
    )
    tr = Trainer(preset, data_dir=str(tmp_path / "data"),
                 run_name="31313131", writer=False)
    tr.writer = None
    saves = []
    orig = tr.ckpt.save
    tr.ckpt.save = lambda name, state, epoch, *a, **k: (
        saves.append((name, epoch)), orig(name, state, epoch, *a, **k))
    tr.fit(verbose=False)
    last_epochs = [e for n, e in saves if n == "last"]
    assert last_epochs == [1, 2]  # epoch 1 (cadence) + epoch 2 (final)
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "31313131"
    assert (run_dir / "last").exists()


def test_best_threshold_only_moves_on_save(tmp_path, monkeypatch):
    """save_best_every_epochs=2 with an improvement inside the skipped
    window: the tracked/persisted best_val_loss must equal the loss of the
    `best` checkpoint actually on disk (an unsaved improvement must NOT
    raise the threshold, or after resume no epoch could ever re-save
    `best` over weights that were never written)."""
    _mini_dataset(tmp_path / "data")
    preset = _preset(tmp_path)
    preset = dataclasses.replace(
        preset, train=dataclasses.replace(
            preset.train, num_epochs=4, save_best_every_epochs=2,
        )
    )
    tr = Trainer(preset, data_dir=str(tmp_path / "data"),
                 run_name="32323232", writer=False)
    tr.writer = None
    # Scripted val losses: epoch 2's 0.4 improves on the saved 0.5 but the
    # cadence gate (last save at epoch 1) skips it; epoch 3 regresses.
    script = iter([1.0, 0.5, 0.4, 0.6])
    monkeypatch.setattr(
        Trainer, "validate",
        lambda self: {"loss": next(script), "loss_std": 0.0})
    best_saves = []
    orig = tr.ckpt.save
    tr.ckpt.save = lambda name, state, epoch, best, *a, **k: (
        best_saves.append((name, epoch, best)),
        orig(name, state, epoch, best, *a, **k))
    final_best = tr.fit(verbose=False)
    best_rows = [(e, b) for n, e, b in best_saves if n == "best"]
    assert best_rows == [(1, 0.5)]  # epoch 2's 0.4 was skipped, not tracked
    assert final_best == 0.5
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "32323232"
    meta = json.loads((run_dir / "best.meta.json").read_text())
    assert meta["best_val_loss"] == 0.5
    # `last` metadata (what resume reads) agrees with the on-disk best.
    last_meta = json.loads((run_dir / "last.meta.json").read_text())
    assert last_meta["best_val_loss"] == 0.5


def test_infer_cli_serving_knobs(trained, tmp_path, monkeypatch, capsys):
    """cli.infer end-to-end from a trained run dir, covering the serving
    branches: bf16 default (with bf16 scores), and --int8 --fused-mlp
    (static-quantized weight layout + Pallas fused MLP, interpret mode on
    CPU).  Guards the restore -> model-swap -> quantize wiring."""
    from jatsr_tpu.cli import infer as infer_cli
    from jatsr_tpu.models.dac import DAC, DACConfig
    from jatsr_tpu.models.dac.model import init_params

    tmp, preset, tr, _ = trained
    run_dir = Path(preset.train.save_dir_base) / "tiny" / "11112222"
    assert run_dir.exists()

    tiny = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                     decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                     codebook_dim=4)
    assert tiny.latent_dim == C
    monkeypatch.setattr(
        DAC, "random_init",
        classmethod(lambda cls, seed=0, cfg=None, compute_dtype=None, **kw: DAC(
            init_params(jax.random.PRNGKey(seed), tiny), tiny,
            compute_dtype=compute_dtype, **kw)),
    )

    inp = tmp_path / "song.lr.npy"
    np.save(inp, np.random.RandomState(0).randn(48, C).astype(np.float16))

    common = ["--run-dir", str(run_dir), "--checkpoint", "last",
              "--stats", str(tmp / "data" / "global_stats_separated.json"),
              "--input", str(inp), "--steps", "2", "--cfg-scale", "2.0"]
    out1 = tmp_path / "out_bf16"
    infer_cli.main(common + ["--output-dir", str(out1)])
    assert (out1 / "song.lr_generated_cfg2.0.wav").exists()

    out2 = tmp_path / "out_fused"
    infer_cli.main(common + ["--output-dir", str(out2), "--int8",
                             "--fused-mlp", "--scores-dtype", "bfloat16"])
    assert "pre-quantized" in capsys.readouterr().out
    assert (out2 / "song.lr_generated_cfg2.0.wav").exists()

    # VERDICT r2 #4: multi-chip serving reachable from the CLI — one song
    # super-resolved over the 8-device virtual mesh, production int8 stack.
    out3 = tmp_path / "out_mesh"
    infer_cli.main(common + ["--output-dir", str(out3), "--int8",
                             "--fused-mlp", "--scores-dtype", "bfloat16",
                             "--attention", "flash", "--mesh", "4", "2"])
    cap = capsys.readouterr().out
    assert "serving mesh: data=4 x model=2" in cap
    assert (out3 / "song.lr_generated_cfg2.0.wav").exists()


def test_pipeline_split_serve_schedule(trained):
    """Multi-chip serving scheduling (VERDICT r4 #5): sampler sharded over
    a (3, 2) mesh on six devices while decode segments round-robin the
    remaining two.  Decode numerics are placement-invariant, so against a
    pipeline with the SAME sampler mesh but in-place decode the audio must
    be bit-EXACT; batched decode (decode_batch=2) must also be exact."""
    from jatsr_tpu.infer import split_serve_devices
    from jatsr_tpu.models.dac import DAC, DACConfig
    from jatsr_tpu.parallel import make_mesh

    tmp, preset, tr, _ = trained
    tiny = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                     decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                     codebook_dim=4)
    codec = DAC.random_init(3, cfg=tiny)
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(num_steps=3,
                         chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    sampler_devs, decode_devs = split_serve_devices(jax.devices(), 2)
    assert len(sampler_devs) == 6 and len(decode_devs) == 2
    mesh = make_mesh(3, 2, devices=sampler_devs)
    lr_latent = np.random.RandomState(2).randn(400, C).astype(np.float32)

    ref = InferencePipeline(tr.model, tr.state.params, norm, codec=codec,
                            sampler_cfg=scfg, hop_length=8, mesh=mesh)
    want = ref.super_resolve_latent_to_audio(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=2,
        segment_frames=100, ctx_frames=12)

    split = InferencePipeline(tr.model, tr.state.params, norm, codec=codec,
                              sampler_cfg=scfg, hop_length=8, mesh=mesh,
                              decode_devices=decode_devs)
    got = split.super_resolve_latent_to_audio(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=2,
        segment_frames=100, ctx_frames=12)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    # several segments actually landed on the reserved decode devices
    assert split._decode_rr >= 2
    assert len(split._decode_params_by_dev) == 2

    # batched decode (VERDICT r4 #4): one [S, L, C] decoder call per pair
    # of segments — identical per-segment math, including the padded tail
    # group and round-robin placement.
    gen = ref.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(5), cfg_scale=2.0, max_batch=2)
    want_pieces = ref.decode_latent(gen, segment_frames=100, ctx_frames=12)
    got_b2 = ref.decode_latent(gen, segment_frames=100, ctx_frames=12,
                               decode_batch=2)
    np.testing.assert_array_equal(got_b2, want_pieces)
    got_b3 = split.decode_latent(gen, segment_frames=100, ctx_frames=12,
                                 decode_batch=3)
    np.testing.assert_array_equal(got_b3, want_pieces)


def test_per_chunk_noise_grouping_invariance(trained):
    """Under chunk_noise="per_chunk" (default), the generated latent is
    invariant to max_batch grouping, and pad_tail_group=True (reuse the
    full-size group's compiled program for the tail) is exact for the
    real chunks.  The reference's serial chunk loop draws noise per chunk
    (infer_test_v3m2.py:370-398), so this is also its semantics."""
    import dataclasses as dc

    tmp, preset, tr, _ = trained
    norm = Normalizer(np.zeros(C), np.ones(C), np.zeros(C), np.ones(C))
    scfg = SamplerConfig(num_steps=3,
                         chunk_duration=64 * 512 / 44100,
                         overlap_duration=16 * 512 / 44100)
    lr_latent = np.random.RandomState(4).randn(250, C).astype(np.float32)
    pipe = InferencePipeline(tr.model, tr.state.params, norm,
                             sampler_cfg=scfg)
    one = np.asarray(pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=0))
    grouped = np.asarray(pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=2))
    np.testing.assert_array_equal(one, grouped)

    padded_pipe = InferencePipeline(
        tr.model, tr.state.params, norm,
        sampler_cfg=dc.replace(scfg, pad_tail_group=True))
    # 250 frames -> 6 chunks of 64/16 overlap: groups [4, 2] -> tail padded
    # to 4 under pad_tail_group
    padded = np.asarray(padded_pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=4))
    np.testing.assert_array_equal(one, padded)

    # "batch" restores the rounds-1-4 whole-batch noise mapping (different
    # draws, still a valid sample)
    legacy_pipe = InferencePipeline(
        tr.model, tr.state.params, norm,
        sampler_cfg=dc.replace(scfg, chunk_noise="batch"))
    legacy = np.asarray(legacy_pipe.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=0))
    assert not np.array_equal(one, legacy)

    # pad_tail_group UNDER a mesh: the tail target (max_batch) must also
    # round up to the data-axis multiple — the same rounding full groups
    # get, so both compile to one program shape.  Padding must be exact
    # RELATIVE to the same mesh (mesh-vs-single differs by sharded
    # reduction order, which is not this property).
    from jatsr_tpu.parallel import make_mesh
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    # 250 frames -> 6 chunks: max_batch=4 -> groups [4, 2]: tail 2 ->
    # target 4 (divisible by data=2).
    mesh_nopad = InferencePipeline(tr.model, tr.state.params, norm,
                                   sampler_cfg=scfg, mesh=mesh)
    mesh_pad = InferencePipeline(
        tr.model, tr.state.params, norm,
        sampler_cfg=dc.replace(scfg, pad_tail_group=True), mesh=mesh)
    want = np.asarray(mesh_nopad.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=4))
    got = np.asarray(mesh_pad.super_resolve_latent_device(
        lr_latent, jax.random.PRNGKey(7), cfg_scale=2.0, max_batch=4))
    np.testing.assert_array_equal(got, want)
