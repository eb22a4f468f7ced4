"""Summarize a tpu_ab.sh results file into the PERF.md decision table.

Usage: python tools/summarize_ab.py [/tmp/tpu_ab.jsonl]

Reads the JSONL the sweep appends (one record per leg, `config` injected
by tpu_ab.sh), keeps the LAST record per config (re-runs supersede), and
prints a markdown table plus the decision-rule calls from docs/PERF.md:
flip a default only when the variant beats its baseline by more than the
platform's noise band (±30%) AND its PSNR guard holds.
"""

from __future__ import annotations

import json
import sys

NOISE = 1.30  # flip defaults only outside the ±20-30% tunnel noise band

# variant -> the baseline it must beat
BASELINES = {
    "interleave_800": "base_800",
    "psampling_800": "base_800",
    "tile512_800": "base_800",
    "tile2048_800": "base_800",
    "accel_800": "base_800",
    # Round-3 accel redesign: mask-only culling + ray packing. accel_mask
    # isolates the occupancy-mask overhead vs dense; accel_cull is the new
    # default accel path (mask + packing) and must beat the DENSE baseline
    # to earn the headline; the compaction legs are the retired design.
    "accel_mask_800": "base_800",
    "accel_cull_800": "base_800",
    "accel_cull_aabb": "accel_cull_800",
    "accel_cull_probe": "accel_cull_800",
    "accel_off_800": "base_800",
    "accel_off_aabb": "accel_off_800",
    "accel_off_probe": "base_800",
    "off_probe_s4": "base_800",
    "off_probe_s8": "off_probe_s4",
    "s32x64_off_probe_s4": "s32x64_800",
    "s64x0_off_probe_s4": "s64x0_accel_aabb",
    "s32x64_off_aabb": "s32x64_accel_aabb",
    "s32x64_off_probe": "s32x64_off_aabb",
    "s64x0_off_aabb": "s64x0_accel_aabb",
    "accel_gc_800": "base_800",
    "accel_scatter_800": "base_800",
    "accel_interleave": "accel_800",
    "accel_psampling": "accel_800",
    "accel256_800": "accel_800",
    "accel_tight_800": "accel_800",
    "accel_aabb_800": "accel_800",
    "s32x64_aabb_psamp": "s32x64_accel_aabb",
    "default_800": "base_800",
    "train": "train_xla",
    "train_accel": "train",
    "s32x64_accel_800": "s32x64_800",
    "s32x64_accel_aabb": "s32x64_accel_800",
    "s32x64_aabb_probe": "s32x64_accel_aabb",
    "s16x32_aabb_probe": "s16x32_accel_aabb",
    "student128_800": "base_800",
    "hashgrid_800": "base_800",
    "hashgrid_s32x64": "s32x64_800",
    "hashgrid_train": "train",
    "hashgrid_train_sc": "hashgrid_train",
    "hashgrid_train_srt": "hashgrid_train_sc",
    "hashgrid_s128x0": "hashgrid_800",
    "s128x0_accel_aabb": "accel_aabb_800",
    "s64x0_accel_aabb": "s128x0_accel_aabb",
}


def main(path: str = "/tmp/tpu_ab.jsonl") -> None:
    recs = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "config" in r:
                    recs[r["config"]] = r
    except FileNotFoundError:
        sys.exit(f"no results file at {path}")
    if not recs:
        sys.exit(f"{path} holds no config records")

    print("| config | rays/s | vs 10M | accel_psnr | full_psnr | note |")
    print("|---|---|---|---|---|---|")
    for name, r in recs.items():
        note = r.get("error") or r.get("note") or ""
        print(f"| {name} | {r.get('value', 0):,.0f} | "
              f"{r.get('vs_baseline', 0):.4f} | "
              f"{r.get('accel_psnr_db', '—')} | {r.get('full_psnr_db', '—')} | "
              f"{note[:60]} |")

    print("\nDecision calls (beat baseline x"
          f"{NOISE:.2f}, PSNR guard clean):")
    for name, base in BASELINES.items():
        a, b = recs.get(name), recs.get(base)
        if not a or not b:
            continue
        if "error" in a:
            print(f"- {name}: INVALID ({a['error'][:60]})")
            continue
        va, vb = a.get("value", 0), b.get("value", 0)
        if vb <= 0:
            continue
        ratio = va / vb
        verdict = ("WINNER — flip the default" if ratio > NOISE else
                   "loser — consider deleting" if ratio < 1 / NOISE else
                   "within noise — keep default")
        print(f"- {name} vs {base}: {ratio:.2f}x ({va:,.0f} vs {vb:,.0f}) "
              f"-> {verdict}")


if __name__ == "__main__":
    main(*sys.argv[1:])
