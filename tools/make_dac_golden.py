"""Generate the golden DAC latent fixture (tests/fixtures/dac_golden_44k.npz).

Runs the TORCH mirror (tests/dac_mirror.py) of the published DAC at the
production 44 kHz geometry with deterministic numpy-recipe weights, and
saves (audio in, z_q latents out, RVQ codes).  tests/test_dac.py then
compares the JAX port against this fixture WITHOUT torch in the loop — a
regression gate on conv padding, weight-norm folding, and RVQ ordering.

Usage: python tools/make_dac_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from jatsr_tpu.models.dac import DACConfig  # noqa: E402
from dac_mirror import TorchDAC, golden_audio, numpy_weights  # noqa: E402

WEIGHT_SEED = 0


def main():
    cfg = DACConfig()
    model = TorchDAC(cfg).eval()
    numpy_weights(model, seed=WEIGHT_SEED)
    audio = golden_audio(4096)
    with torch.no_grad():
        z_e, z_q, codes = model.encode_q(torch.from_numpy(audio))
    out = REPO / "tests" / "fixtures" / "dac_golden_44k.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out,
        audio=audio,
        z_e=z_e.numpy().astype(np.float32),
        z_q=z_q.numpy().astype(np.float32),
        codes=codes.numpy().astype(np.int32),
        weight_seed=np.int64(WEIGHT_SEED),
    )
    print(f"wrote {out} (z_q {z_q.shape}, codes {codes.shape})")


if __name__ == "__main__":
    main()
