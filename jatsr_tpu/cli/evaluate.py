"""CLI: audio quality metrics (the reference's calculate_metrics.py).

Usage:
    python -m jatsr_tpu.cli.evaluate --pred gen.wav --gt gt.wav \
        [--lr-baseline lr.wav]

Prints LSD, Mel L1/L2 (single + multi-scale) and the quality grading; with
``--lr-baseline`` also reports the improvement over the LR input, as the
reference README does (README.md:290-297).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--lr-baseline", default=None)
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--platform", default=None,
                help="force jax platform (cpu/tpu)")
    args = ap.parse_args(argv)

    from ..utils.runtime import select_platform

    select_platform(args.platform)

    from ..metrics import (
        calculate_lsd,
        calculate_mel_loss,
        calculate_multi_scale_mel_loss,
        grade_quality,
    )
    from ..utils import load_wav

    pred, _ = load_wav(args.pred, mono=True)
    gt, _ = load_wav(args.gt, mono=True)

    def report(name, a, b):
        lsd, _ = calculate_lsd(a, b)
        l1, l2, _, _ = calculate_mel_loss(a, b, sr=args.sr)
        ms1, ms2, _ = calculate_multi_scale_mel_loss(a, b, sr=args.sr)
        print(f"--- {name} ---")
        print(f"  LSD:            {lsd:6.2f} dB")
        print(f"  Mel L1 / L2:    {l1:6.2f} / {l2:6.2f} dB")
        print(f"  MS-Mel L1 / L2: {ms1:6.2f} / {ms2:6.2f} dB")
        print(f"  Grade:          {grade_quality(lsd, l1)}")
        return lsd, l1, l2

    lsd_p, l1_p, l2_p = report("generated vs GT", pred, gt)
    if args.lr_baseline:
        lr, _ = load_wav(args.lr_baseline, mono=True)
        lsd_b, l1_b, l2_b = report("LR input vs GT (baseline)", lr, gt)
        print("--- improvement over LR baseline ---")
        for name, p, b in [("LSD", lsd_p, lsd_b), ("Mel L1", l1_p, l1_b),
                           ("Mel L2", l2_p, l2_b)]:
            sign = "+" if b - p >= 0 else ""
            pct = 100.0 * (b - p) / max(abs(b), 1e-9)
            print(f"  {name}: {sign}{b - p:.2f} dB ({sign}{pct:.1f}%)")


if __name__ == "__main__":
    main()
