"""Preprocess host/device-overlap A/B (VERDICT r3 #7).

Times `PreprocessPipeline.run` over the same song set twice — serial
(prefetch=False, the round-3 shape: host wav-decode/resample/windowing
and device encode back-to-back per song) vs the one-song-lookahead
prefetch thread (default since round 4) — and prints songs/min plus the
speedup.  The reference overlapped this via a worker-process pool
(prepare_dataset_v5.py:326-381); here one lookahead thread suffices
because the device encode is a single batched jitted call per song.

Usage:
    python tools/preprocess_bench.py --source-dir /tmp/probe/songs \
        [--num-songs 12] [--out /tmp/prep_bench]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-dir", required=True)
    ap.add_argument("--num-songs", type=int, default=12)
    ap.add_argument("--out", default="/tmp/prep_bench")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from jatsr_tpu.utils.runtime import select_platform

    select_platform(args.platform)

    from jatsr_tpu.configs import DataConfig
    from jatsr_tpu.data import PreprocessPipeline
    from jatsr_tpu.models.dac import DAC

    src = Path(args.out) / "songs"
    if src.exists():
        shutil.rmtree(src)
    src.mkdir(parents=True)
    wavs = sorted(Path(args.source_dir).glob("*.wav"))[: args.num_songs]
    assert wavs, f"no wavs under {args.source_dir}"
    for w in wavs:
        shutil.copy(w, src / w.name)

    codec = DAC.random_init(0)
    results = {}
    for mode, pf in (("serial", False), ("prefetch", True)):
        out = Path(args.out) / mode
        if out.exists():
            shutil.rmtree(out)
        pipe = PreprocessPipeline(codec, DataConfig(), str(out))
        if mode == "serial":  # warmup leg compiles the encode programs
            pipe_w = PreprocessPipeline(
                codec, DataConfig(), str(Path(args.out) / "warmup"))
            pipe_w.run([str(src)], verbose=False, prefetch=False)
        t0 = time.perf_counter()
        counts = pipe.run([str(src)], verbose=False, prefetch=pf)
        dt = time.perf_counter() - t0
        assert counts["done"] == len(wavs), counts
        results[mode] = dt
        print(f"[prep-bench] {mode:9s} {len(wavs)} songs in {dt:.1f}s "
              f"= {len(wavs) / dt * 60:.1f} songs/min")
    print(f"[prep-bench] prefetch speedup: "
          f"{results['serial'] / results['prefetch']:.2f}x")


if __name__ == "__main__":
    main()
