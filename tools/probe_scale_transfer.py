"""Scale-transfer table: do the 60 M probe's schedule verdicts hold at 288 M?

VERDICT r4 #3: every schedule decision (cfg-interval revert, euler-25
sanctioning, heun ranking) rested on a 60 M probe; round 3 -> 4 proved probe
verdicts can flip with probe size.  This tool reads two probe-gate
``summary.json`` files (tools/probe_gate_r4.py output, one per model scale)
and prints the per-condition dLSD/dMelL1 deltas side by side, flagging any
condition whose verdict class changes between scales.

Verdict classes (on dLSD vs the parity condition):
    clean      |dLSD| <= 0.05  (within the seed-noise floor)
    marginal   0.05 < |dLSD| <= 0.15
    costly     dLSD > 0.15    (the round-4 interval-window class)
    better     dLSD < -0.15

Usage: python tools/probe_scale_transfer.py SUMMARY_60M SUMMARY_288M \
           [--out reports/scale_transfer_r5.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def verdict_class(dlsd: float) -> str:
    if abs(dlsd) <= 0.05:
        return "clean"
    if dlsd > 0.15:
        return "costly"
    if dlsd < -0.15:
        return "better"
    return "marginal"


def deltas(summary: dict) -> dict:
    base = summary["parity"]["avg"]
    out = {}
    for name, r in summary.items():
        out[name] = {
            "lsd": r["avg"]["lsd"],
            "dlsd": r["avg"]["lsd"] - base["lsd"],
            "dmel": r["avg"]["mel_l1"] - base["mel_l1"],
            "class": verdict_class(r["avg"]["lsd"] - base["lsd"]),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("summary_small")
    ap.add_argument("summary_large")
    ap.add_argument("--labels", nargs=2, default=["60M", "288M"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    small = deltas(json.loads(Path(args.summary_small).read_text()))
    large = deltas(json.loads(Path(args.summary_large).read_text()))
    a, b = args.labels

    rows = {}
    flips = []
    print(f"{'condition':16} {a + ' dLSD':>10} {b + ' dLSD':>10} "
          f"{a + ' class':>10} {b + ' class':>10}  transfer")
    for name in small:
        if name not in large:
            continue
        s, l = small[name], large[name]
        same = s["class"] == l["class"]
        if not same and name != "parity":
            flips.append(name)
        rows[name] = {a: s, b: l, "transfers": same}
        print(f"{name:16} {s['dlsd']:+10.3f} {l['dlsd']:+10.3f} "
              f"{s['class']:>10} {l['class']:>10}  "
              f"{'ok' if same else 'FLIP'}")
    result = {"labels": args.labels, "conditions": rows, "flips": flips}
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(result, indent=2))
        print(f"[scale-transfer] written: {args.out}")
    if flips:
        print(f"[scale-transfer] VERDICT FLIPS at scale: {flips} — "
              "the small-probe verdict does NOT transfer for these")
    else:
        print("[scale-transfer] all condition verdicts agree across scales")


if __name__ == "__main__":
    main()
