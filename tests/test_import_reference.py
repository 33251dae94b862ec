"""End-to-end rehearsal of tools/import_reference.py (VERDICT r3 #6).

The real published artifacts are unobtainable offline, so the command is
exercised with MIRROR-generated checkpoints: a torch DAC in the published
key schema (tests/dac_mirror.py) and a reference-architecture DiT
checkpoint in the train_ddp_*.py save format (tests/test_dit_convert.py's
TRefDiT) — the day real artifacts appear, the same command is a
zero-risk run."""

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jatsr_tpu.configs import Preset, get_preset  # noqa: E402
from jatsr_tpu.models.dac import DACConfig  # noqa: E402

from dac_mirror import TorchDAC, mirror_state_dict, numpy_weights  # noqa: E402
from test_dit_convert import CFG as DIT_CFG  # noqa: E402
from test_dit_convert import TRefDiT  # noqa: E402

import import_reference  # noqa: E402

TINY_DAC = dict(encoder_dim=8, encoder_rates=(2, 4), decoder_dim=16,
                decoder_rates=(4, 2), n_codebooks=2, codebook_size=16,
                codebook_dim=4)


def test_import_command_end_to_end(tmp_path):
    # --- fabricate "reference" artifacts with the torch mirrors ---
    dcfg = DACConfig(**TINY_DAC)
    mirror = TorchDAC(dcfg)
    numpy_weights(mirror, seed=11)
    pth = tmp_path / "weights_44khz.pth"
    torch.save({"state_dict": mirror_state_dict(mirror),
                "metadata": {"sample_rate": 44100}}, pth)

    torch.manual_seed(1)
    tdit = TRefDiT(DIT_CFG)
    pt = tmp_path / "last.pt"
    torch.save({"model_state_dict": {
        "module." + k: v for k, v in tdit.state_dict().items()},
        "epoch": 3}, pt)

    preset = get_preset("tiny")
    preset = dataclasses.replace(preset, model=DIT_CFG)
    pj = tmp_path / "preset.json"
    pj.write_text(preset.to_json())
    dj = tmp_path / "dac_cfg.json"
    dj.write_text(json.dumps(TINY_DAC))

    # --- the one command ---
    out = tmp_path / "imported"
    report = import_reference.main([
        "--dac-weights", str(pth), "--dac-config-json", str(dj),
        "--dit-checkpoint", str(pt), "--preset-json", str(pj),
        "--output-dir", str(out),
    ])

    # artifacts
    assert (out / "dac.npz").exists()
    assert (out / "report.json").exists()
    assert (out / "run" / "preset.json").exists()
    assert (out / "run" / "imported").exists()

    # parity numbers: converted stacks match the torch mirrors
    dac_par = report["dac"]["parity_vs_torch_mirror"]
    assert "error" not in dac_par, dac_par
    assert dac_par["rvq_code_agreement"] == 1.0
    assert dac_par["latent_max_abs"] < 1e-4
    assert dac_par["decoded_wav_max_abs"] < 1e-4
    assert dac_par["missing_keys"] == 0 and dac_par["unexpected_keys"] == 0
    dit_par = report["dit"]["parity_vs_torch_mirror"]
    assert "error" not in dit_par, dit_par
    assert dit_par["output_rel"] < 1e-4
    assert report["dit"]["smoke"]["finite"]

    # torch-free npz reload round-trips exactly
    from jatsr_tpu.models.dac.convert import (
        load_params_npz,
        load_torch_checkpoint,
    )

    p1 = load_torch_checkpoint(str(pth), dcfg)
    p2 = load_params_npz(str(out / "dac.npz"))
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the run dir restores through the standard checkpoint path
    import jax.numpy as jnp

    from jatsr_tpu.models import DiT
    from jatsr_tpu.train import create_train_state
    from jatsr_tpu.train.checkpoint import CheckpointManager

    model = DiT(dataclasses.replace(DIT_CFG, dropout=0.0,
                                    drop_path_rate=0.0))
    dummy = jnp.zeros((1, 8, DIT_CFG.input_channels), jnp.float32)
    state = create_train_state(model, preset.train, 1, (dummy, dummy))
    restored, meta = CheckpointManager(out / "run").restore(
        "imported", state)
    assert meta["imported_from"] == str(pt)
    y = model.apply({"params": restored.params}, dummy,
                    jnp.zeros((1,), jnp.float32), dummy)
    assert bool(jnp.isfinite(y).all())
