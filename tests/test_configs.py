"""Preset hyperparameter pins against the reference's published values —
guards against accidental drift (all cites into /root/reference)."""

from jatsr_tpu.configs import get_preset


def test_shared_geometry():
    for name in ("v1", "v2", "v3", "v3m2", "v3mod2", "v3mod3"):
        p = get_preset(name)
        m, d = p.model, p.data
        assert m.input_channels == 1024 and m.cond_channels == 1024
        assert m.patch_len == 4 and m.bottleneck_dim == 512
        assert m.mlp_ratio == 4.0
        assert d.target_frames == 1378  # 16s * 44100 / 512
        assert d.dac_hop_length == 512 and d.dac_sample_rate == 44100
        assert d.high_sr == 48000 and d.low_sr == 16000
        assert d.chunk_duration == 7.0 and d.overlap_duration == 0.5


def test_training_hparams_match_reference():
    # train_ddp_v3mod2.py:375-381
    t = get_preset("v3mod2").train
    assert t.batch_size == 28
    assert t.lr == 5e-5
    assert t.weight_decay == 0.1
    assert t.warmup_steps == 1000
    assert t.num_epochs == 300
    assert t.grad_clip == 1.0
    assert t.condition_noise_ratio == 0.05 and t.use_adaptive_noise
    assert t.timestep_alpha == 0.5
    assert t.save_interval_steps == 1000


def test_model_sizes():
    # train_ddp_v1/v2/v3.py:64-72
    v1, v2, v3 = (get_preset(n).model for n in ("v1", "v2", "v3"))
    assert (v1.hidden_size, v1.depth, v1.num_q_heads, v1.num_kv_heads) == \
        (512, 12, 8, 4)
    assert (v2.hidden_size, v2.depth, v2.num_q_heads, v2.num_kv_heads) == \
        (1024, 16, 16, 4)
    assert (v3.hidden_size, v3.depth, v3.num_q_heads, v3.num_kv_heads) == \
        (1280, 28, 20, 4)
    assert v3.dropout == 0.1 and v3.drop_path_rate == 0.05


def test_loss_stack_weights():
    # train_ddp_v3mod2.py:361-373
    l = get_preset("v3mod2").loss
    assert l.use_latent_perceptual
    assert l.latent_loss_weight == 0.3
    assert l.freq_weight == 0.5 and l.ms_weight == 0.5
    assert l.consistency_weight == 0.1
    assert l.low_freq_phase_ratio == 0.3
    assert l.ms_scales == (1, 2, 4)
    assert l.strict_cutoff == 0.30 and l.soft_cutoff == 0.36
    # v3mod3: Charbonnier main loss (train_ddp_v3mod3.py:402-436)
    l3 = get_preset("v3mod3").loss
    assert l3.reconstruction == "charbonnier"
    assert l3.charbonnier_eps == 1e-6
    assert l3.use_latent_perceptual


def test_v3m2_cfg_training():
    # train_ddp_v3m2.py:64-91
    p = get_preset("v3m2")
    assert p.model.norm == "rms"
    assert p.train.cfg_dropout_prob == 0.1
    assert p.train.condition_noise_ratio == 0.02
    assert not p.loss.use_latent_perceptual


def test_sampler_defaults():
    # infer_test_v3m2.py / README.md:232-241
    s = get_preset("v3").sampler
    assert s.num_steps == 50
    assert s.t_jump_threshold == 0.999
    assert s.velocity_eps == 1e-5
    assert s.chunk_duration == 16.0 and s.overlap_duration == 2.0
    assert s.solver == "euler"  # parity default


def test_rope_and_maxlen():
    m = get_preset("v2").model
    assert m.rope_base == 10000.0
    assert m.rope_max_seq_len == 4096  # jat_audiosr_v2.py:53
    assert m.max_len == 2048  # jat_audiosr_v2.py:338
