"""Convert a reference-produced latent dataset to the jatsr_tpu layout.

The reference's prepare_dataset_v5.py emits per-song ``.pt`` files holding
``{'hr_latent': fp16 [1024, T], 'lr_latent': fp16 [1024, T], 'metadata'}``
plus ``global_stats*.json``.  This tool rewrites them as this framework's
mmap-able ``.hr.npy`` / ``.lr.npy`` pairs (time-major [T, 1024]) + meta
JSON, and copies the stats file — so a user of the reference can reuse an
existing preprocessed dataset without re-encoding anything.

Usage:
    python tools/convert_reference_dataset.py \
        --input data_processed_v13_final --output data_processed
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_song(pt_path: Path, out_dir: Path) -> int:
    import torch

    data = torch.load(pt_path, map_location="cpu", weights_only=False)
    hr = data["hr_latent"]
    lr = data["lr_latent"]
    hr = hr.detach().cpu().numpy() if hasattr(hr, "detach") else np.asarray(hr)
    lr = lr.detach().cpu().numpy() if hasattr(lr, "detach") else np.asarray(lr)
    if hr.ndim == 3:  # [1, C, T] -> [C, T]
        hr, lr = hr[0], lr[0]
    hr = np.ascontiguousarray(hr.T.astype(np.float16))  # [T, C]
    lr = np.ascontiguousarray(lr.T.astype(np.float16))
    base = out_dir / pt_path.stem
    np.save(str(base) + ".hr.npy", hr)
    np.save(str(base) + ".lr.npy", lr)
    meta = dict(data.get("metadata", {}))
    meta.setdefault("name", pt_path.stem)
    meta["frames"] = int(hr.shape[0])
    Path(str(base) + ".meta.json").write_text(
        json.dumps(meta, ensure_ascii=False, default=str)
    )
    return hr.shape[0]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    src, dst = Path(args.input), Path(args.output)
    total = 0
    for split in ("train", "val"):
        out_dir = dst / split
        out_dir.mkdir(parents=True, exist_ok=True)
        for pt in sorted((src / split).glob("*.pt")):
            frames = convert_song(pt, out_dir)
            total += 1
            print(f"[convert] {split}/{pt.name}: {frames} frames")
    for stats in ("global_stats_separated.json", "global_stats.json"):
        if (src / stats).exists():
            shutil.copy(src / stats, dst / stats)
            print(f"[convert] copied {stats}")
    print(f"[convert] {total} songs -> {dst}")


if __name__ == "__main__":
    main()
