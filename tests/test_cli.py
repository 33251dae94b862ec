"""CLI smoke tests: argument wiring and end-to-end invocation of each
entry point with tiny inputs (the CLIs replace the reference's script
surface; see COMPONENTS.md)."""

import json
from pathlib import Path

import numpy as np
import pytest

from jatsr_tpu.utils import save_wav


def test_params_cli(capsys):
    from jatsr_tpu.cli.params import main

    main(["--preset", "v3"])
    out = capsys.readouterr().out
    assert "766" in out and "adaln" in out

    main(["--compare", "v1", "v2"])
    out = capsys.readouterr().out
    assert "v2 vs v1" in out


def test_check_env_cli(capsys):
    from jatsr_tpu.cli.check_env import main

    main([])
    out = capsys.readouterr().out
    assert "environment OK" in out


def test_evaluate_cli(tmp_path, capsys):
    from jatsr_tpu.cli.evaluate import main

    sr = 8000
    t = np.arange(sr) / sr
    gt = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pred = (0.5 * np.sin(2 * np.pi * 460 * t)).astype(np.float32)
    save_wav(tmp_path / "gt.wav", gt, sr)
    save_wav(tmp_path / "pred.wav", pred, sr)
    main(["--pred", str(tmp_path / "pred.wav"), "--gt", str(tmp_path / "gt.wav"),
          "--lr-baseline", str(tmp_path / "gt.wav"), "--sr", str(sr)])
    out = capsys.readouterr().out
    assert "LSD" in out and "improvement over LR baseline" in out


def test_prepare_dataset_cli(tmp_path, capsys, monkeypatch):
    """Full prepare_dataset CLI on one tiny WAV with a tiny random codec."""
    from jatsr_tpu.cli import prepare_dataset
    from jatsr_tpu.models.dac import DAC, DACConfig

    tiny = DACConfig(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                     decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                     codebook_dim=4)
    monkeypatch.setattr(
        "jatsr_tpu.models.dac.DAC.random_init",
        classmethod(lambda cls, seed=0, cfg=None: DAC(
            __import__("jatsr_tpu.models.dac.model", fromlist=["init_params"])
            .init_params(__import__("jax").random.PRNGKey(0), tiny), tiny)),
    )
    src = tmp_path / "src"
    src.mkdir()
    sr = 48000
    t = np.arange(int(sr * 1.2)) / sr
    save_wav(src / "a.wav", (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    prepare_dataset.main([
        "--source-dirs", str(src), "--output-dir", str(tmp_path / "out"),
        "--val-ratio", "0.0", "--chunk-duration", "0.5",
        "--overlap-duration", "0.1",
    ])
    out = capsys.readouterr().out
    assert "'done': 1" in out
    assert (tmp_path / "out" / "train" / "a.hr.npy").exists()
    assert (tmp_path / "out" / "global_stats_separated.json").exists()


def test_preset_json_roundtrip():
    from jatsr_tpu.configs import Preset, get_preset

    p = get_preset("v3mod2")
    p2 = Preset.from_json(p.to_json())
    assert p2 == p
