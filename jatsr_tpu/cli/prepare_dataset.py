"""CLI: offline preprocessing (the reference's prepare_dataset_v5.py).

Usage:
    python -m jatsr_tpu.cli.prepare_dataset --source-dirs DIR [DIR...] \
        --output-dir data_processed [--dac-weights weights.pth]

Scans WAVs, splits 90/10 with seed 42, chunks 7 s (+0.5 s context),
simulates 16 kHz LR, DAC-encodes on the accelerator, writes fp16 latents +
global stats, and resumes from processed_files.jsonl on re-run.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source-dirs", nargs="+", required=True)
    ap.add_argument("--output-dir", default="data_processed")
    ap.add_argument("--dac-weights", default=None,
                    help="Path to a torch DAC 44 kHz checkpoint (.pth); "
                         "random weights (testing only) if omitted")
    ap.add_argument("--val-ratio", type=float, default=0.1)
    ap.add_argument("--chunk-duration", type=float, default=7.0)
    ap.add_argument("--overlap-duration", type=float, default=0.5)
    ap.add_argument("--num-shards", type=int, default=1,
                    help="partition the file list across hosts")
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--encode-devices", type=int, default=1,
                    help="round-robin song encodes over the first N local "
                         "devices with deferred fetches (the reference's "
                         "one-worker-per-GPU pool, prepare_dataset_v5.py:"
                         "326-381, as concurrent jit dispatch); 0 = all "
                         "local devices")
    ap.add_argument("--chunking", default="overlap",
                    choices=["overlap", "plain", "whole"],
                    help="historical preprocessing generation "
                         "(overlap=v4/v5 default, plain=v3, whole=v2)")
    ap.add_argument("--platform", default=None,
                help="force jax platform (cpu/tpu)")
    args = ap.parse_args(argv)

    from ..utils.runtime import select_platform

    select_platform(args.platform)

    import dataclasses

    from ..configs import DataConfig
    from ..data import PreprocessPipeline
    from ..models.dac import DAC

    if args.dac_weights:
        from ..models.dac.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.dac_weights)
        codec = DAC(params)
    else:
        print("[warn] no --dac-weights given: using RANDOM codec weights "
              "(shape-correct, for pipeline testing only)")
        codec = DAC.random_init(0)

    cfg = dataclasses.replace(
        DataConfig(),
        val_ratio=args.val_ratio,
        chunk_duration=args.chunk_duration,
        overlap_duration=args.overlap_duration,
        chunking=args.chunking,
    )
    devices = None
    if args.encode_devices != 1:
        import jax

        n = args.encode_devices or len(jax.devices())
        devices = jax.devices()[:n]
    pipe = PreprocessPipeline(codec, cfg, args.output_dir, devices=devices)
    counts = pipe.run(args.source_dirs, num_shards=args.num_shards,
                      shard_index=args.shard_index)
    print(f"[prepare_dataset] {counts}")


if __name__ == "__main__":
    main()
