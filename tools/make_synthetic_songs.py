"""Generate synthetic 44.1 kHz test songs (WAV) for end-to-end rehearsals.

No real music ships with this repo; these deterministic multi-voice clips
(chords with vibrato, percussion clicks, band-limited noise, chirps) give
the preprocess -> train -> eval pipeline realistic broadband material.

Usage: python tools/make_synthetic_songs.py --out-dir /tmp/songs [--n 12]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jatsr_tpu.utils import save_wav  # noqa: E402

SR = 44100


def make_song(seed: int, seconds: float) -> np.ndarray:
    rs = np.random.RandomState(seed)
    t = np.arange(int(SR * seconds)) / SR
    out = np.zeros_like(t)
    # chord stack with vibrato
    root = rs.uniform(110, 440)
    for mult in (1.0, 1.25, 1.5, 2.0):
        vib = 1 + 0.002 * np.sin(2 * np.pi * rs.uniform(4, 7) * t)
        out += rs.uniform(0.1, 0.25) * np.sin(
            2 * np.pi * root * mult * vib * t + rs.uniform(0, 6.28)
        )
    # moving chirp for HF content
    f0, f1 = rs.uniform(1000, 3000), rs.uniform(6000, 15000)
    out += 0.1 * np.sin(2 * np.pi * (f0 + (f1 - f0) * t / seconds) * t)
    # percussion: exponentially-decayed clicks on a grid
    period = rs.uniform(0.4, 0.7)
    for start in np.arange(0.1, seconds, period):
        i0 = int(start * SR)
        n = min(3000, out.size - i0)
        out[i0:i0 + n] += 0.4 * np.exp(-np.arange(n) / 400.0) * rs.randn(n)
    # band-limited noise bed
    noise = rs.randn(out.size)
    kernel = np.hanning(32); kernel /= kernel.sum()
    out += 0.03 * np.convolve(noise, kernel, mode="same")
    # fade + normalize
    fade = min(2000, out.size // 10)
    out[:fade] *= np.linspace(0, 1, fade)
    out[-fade:] *= np.linspace(1, 0, fade)
    return (0.8 * out / np.abs(out).max()).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--seconds", type=float, default=24.0)
    args = ap.parse_args()
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        save_wav(out / f"song_{i:02d}.wav", make_song(1000 + i, args.seconds),
                 SR)
    print(f"wrote {args.n} songs to {out}")


if __name__ == "__main__":
    main()
