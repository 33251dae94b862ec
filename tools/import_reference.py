"""One-command reference import (VERDICT r3 #6).

Converts a reference user's artifacts — the published DAC 44 kHz ``.pth``
(loaded by the reference via ``dac.utils.download`` + ``DAC.load``,
infer_test_v3m2.py:97-104) and/or a ``train_ddp_*.py`` DiT checkpoint
``.pt`` (save format infer_test_v3m2.py:33-94) — into this framework,
runs numeric parity checks against the in-repo torch mirrors, smoke-runs
the converted model, and writes:

- ``OUT/dac.npz`` — converted codec params (torch-free reload:
  ``cli.infer --dac-weights OUT/dac.npz``),
- ``OUT/run/`` — an inference-ready run dir (``preset.json`` + an orbax
  ``imported`` checkpoint) usable directly by
  ``cli.infer --run-dir OUT/run --checkpoint imported``,
- ``OUT/report.json`` — the parity report.

Usage:
    python tools/import_reference.py --output-dir imported \
        [--dac-weights weights_44khz.pth] \
        [--dit-checkpoint last.pt --preset v3mod2 | --preset-json p.json] \
        [--no-parity] [--platform cpu]

Parity checks (skipped with --no-parity or when torch is unavailable):
the state dict is ALSO loaded into the in-repo torch mirrors
(tests/dac_mirror.TorchDAC, tests/test_dit_convert.TRefDiT) and both
stacks run the same inputs — latent/code/waveform/output deltas go into
the report.  The DiT mirror covers the V2 (LayerNorm) architecture; for
RMSNorm presets only the convert+smoke path runs (the converter itself is
parity-tested at both scales in tests/test_dit_convert.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def _import_dac(args, report):
    import numpy as np

    from jatsr_tpu.models.dac import DAC, DACConfig
    from jatsr_tpu.models.dac.convert import (
        load_torch_checkpoint,
        save_params_npz,
    )

    if args.dac_config_json:
        cfg = DACConfig(**json.loads(Path(args.dac_config_json).read_text()))
    else:
        cfg = DACConfig()  # the published 44 kHz geometry
    params = load_torch_checkpoint(args.dac_weights, cfg)
    out = Path(args.output_dir) / "dac.npz"
    save_params_npz(params, str(out))
    print(f"[import] DAC converted -> {out}")
    rep = {"source": args.dac_weights, "output": str(out)}

    codec = DAC(params, cfg)
    clip = np.random.RandomState(7).randn(1, 8 * cfg.hop_length, 1) \
        .astype(np.float32) * 0.1
    z, codes = codec.encode(clip)
    wav = codec.decode(z)
    rep["smoke"] = {
        "latent_shape": list(z.shape),
        "finite": bool(np.isfinite(np.asarray(wav)).all()),
    }

    if not args.no_parity:
        try:
            import torch

            from dac_mirror import TorchDAC

            mirror = TorchDAC(cfg)
            obj = torch.load(args.dac_weights, map_location="cpu",
                             weights_only=False)
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
            # published key schema -> mirror's module names (inverse of
            # dac_mirror.mirror_state_dict)
            ren = {}
            for k, v in sd.items():
                k2 = k
                for a, b in (("encoder.block.", "encoder."),
                             ("decoder.model.", "decoder."),
                             ("quantizer.quantizers.", "quantizers.")):
                    if k.startswith(a):
                        k2 = b + k[len(a):]
                        break
                ren[k2] = v
            missing, unexpected = mirror.load_state_dict(ren, strict=False)
            with torch.no_grad():
                t_in = torch.from_numpy(
                    clip.transpose(0, 2, 1))  # [B, 1, T]
                _, tz, tcodes = mirror.encode_q(t_in)
                twav = mirror.decoder(tz)
            tz = tz.numpy().transpose(0, 2, 1)
            lat_err = float(np.max(np.abs(np.asarray(z) - tz)))
            code_match = float(np.mean(
                np.asarray(codes) == tcodes.numpy()))
            wav_err = float(np.max(np.abs(
                np.asarray(wav)[:, :, 0] - twav.numpy()[:, 0, :])))
            rep["parity_vs_torch_mirror"] = {
                "latent_max_abs": lat_err,
                "rvq_code_agreement": code_match,
                "decoded_wav_max_abs": wav_err,
                "missing_keys": len(missing),
                "unexpected_keys": len(unexpected),
            }
            print(f"[import] DAC parity: latent max-abs {lat_err:.2e}, "
                  f"code agreement {code_match:.4f}, "
                  f"wav max-abs {wav_err:.2e}")
        except Exception as e:  # noqa: BLE001 — report, don't die
            rep["parity_vs_torch_mirror"] = {"error": repr(e)}
            print(f"[import] DAC torch-mirror parity skipped: {e!r}")
    report["dac"] = rep


def _import_dit(args, report):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jatsr_tpu.configs import Preset, get_preset
    from jatsr_tpu.models import DiT, count_params
    from jatsr_tpu.models.convert_dit import load_reference_checkpoint
    from jatsr_tpu.train import create_train_state
    from jatsr_tpu.train.checkpoint import CheckpointManager

    if args.preset_json:
        preset = Preset.from_json(Path(args.preset_json).read_text())
    else:
        preset = get_preset(args.preset)
    mcfg = dataclasses.replace(preset.model, dtype="float32",
                               param_dtype="float32")
    params = load_reference_checkpoint(args.dit_checkpoint, mcfg)
    n = count_params(params)
    print(f"[import] DiT converted: {n / 1e6:.1f}M params "
          f"(preset {preset.name})")
    rep = {"source": args.dit_checkpoint, "preset": preset.name,
           "params_m": round(n / 1e6, 1)}

    # Smoke: one forward on the converted weights.
    model = DiT(dataclasses.replace(mcfg, dropout=0.0, drop_path_rate=0.0))
    C = mcfg.input_channels
    x = jnp.asarray(np.random.RandomState(3).randn(1, 12, C), jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)
    y = model.apply({"params": params}, x, t, x)
    rep["smoke"] = {"output_shape": list(y.shape),
                    "finite": bool(jnp.isfinite(y).all())}

    if not args.no_parity and mcfg.norm == "layer":
        try:
            import torch

            from test_dit_convert import TRefDiT

            tmodel = TRefDiT(mcfg)
            ckpt = torch.load(args.dit_checkpoint, map_location="cpu",
                              weights_only=False)
            sd = ckpt.get("model_state_dict", ckpt)
            sd = {k.removeprefix("module.").removeprefix("_orig_mod."): v
                  for k, v in sd.items()}
            tmodel.load_state_dict(sd)
            with torch.no_grad():
                ty = tmodel(
                    torch.from_numpy(np.asarray(x).transpose(0, 2, 1)),
                    torch.from_numpy(np.asarray(t)),
                    torch.from_numpy(np.asarray(x).transpose(0, 2, 1)),
                ).numpy().transpose(0, 2, 1)
            err = float(np.max(np.abs(np.asarray(y) - ty)))
            denom = float(np.max(np.abs(ty)) + 1e-12)
            rep["parity_vs_torch_mirror"] = {
                "output_max_abs": err, "output_rel": err / denom}
            print(f"[import] DiT parity vs reference-architecture mirror: "
                  f"max-abs {err:.2e} (rel {err / denom:.2e})")
        except Exception as e:  # noqa: BLE001
            rep["parity_vs_torch_mirror"] = {"error": repr(e)}
            print(f"[import] DiT torch-mirror parity skipped: {e!r}")
    elif not args.no_parity:
        print("[import] DiT mirror parity: RMSNorm preset — covered by "
              "tests/test_dit_convert.py, skipping live check")

    # Inference-ready run dir: preset.json + orbax 'imported' checkpoint
    # (cli.infer --run-dir OUT/run --checkpoint imported).
    run_dir = Path(args.output_dir) / "run"
    dummy = jnp.zeros((1, 8, C), jnp.float32)
    state = create_train_state(model, preset.train, 1, (dummy, dummy))
    state = state.replace(params=jax.tree_util.tree_map(
        jnp.asarray, params))
    ckpt = CheckpointManager(run_dir)
    ckpt.save("imported", state, epoch=0, best_val_loss=float("inf"),
              extra={"preset": preset.name,
                     "imported_from": args.dit_checkpoint})
    (run_dir / "preset.json").write_text(preset.to_json())
    rep["run_dir"] = str(run_dir)
    print(f"[import] inference-ready run dir -> {run_dir} "
          f"(use: cli.infer --run-dir {run_dir} --checkpoint imported)")
    report["dit"] = rep


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dac-weights", default=None,
                    help="published DAC 44 kHz .pth")
    ap.add_argument("--dac-config-json", default=None,
                    help="DACConfig field overrides as JSON (default: the "
                         "published 44 kHz geometry)")
    ap.add_argument("--dit-checkpoint", default=None,
                    help="reference train_ddp_*.py checkpoint .pt")
    ap.add_argument("--preset", default="v3mod2",
                    help="preset matching the DiT checkpoint's geometry")
    ap.add_argument("--preset-json", default=None,
                    help="explicit Preset JSON (overrides --preset)")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the torch-mirror parity checks")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args(argv)
    if not args.dac_weights and not args.dit_checkpoint:
        ap.error("nothing to import: pass --dac-weights and/or "
                 "--dit-checkpoint")

    from jatsr_tpu.utils.runtime import select_platform

    select_platform(args.platform)
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)

    report = {}
    if args.dac_weights:
        _import_dac(args, report)
    if args.dit_checkpoint:
        _import_dit(args, report)
    rp = Path(args.output_dir) / "report.json"
    rp.write_text(json.dumps(report, indent=2))
    print(f"[import] report -> {rp}")
    return report


if __name__ == "__main__":
    main()
