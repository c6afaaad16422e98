"""Summarize the flagship lever-ablation record with seed error bars
(round-4 verdict #5): reads benchmarks/results/quality_{lever}[_sSEED].jsonl
and prints recall@10 at epoch 30 as mean +/- spread per lever, plus the
curve-level single-eval sigma derived from quality_prod100.jsonl.

Usage: python benchmarks/ablation_report.py
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

RES = os.path.join(os.path.dirname(__file__), "results")

LEVERS = {
    "prod": ["quality_prod100.jsonl", "quality_prod_s*.jsonl"],
    "negk16": ["quality_negk16.jsonl", "quality_negk16_s*.jsonl"],
    "exactmem": ["quality_exactmem.jsonl", "quality_exactmem_s*.jsonl"],
    "fue8": ["quality_fue8.jsonl", "quality_fue8_s*.jsonl"],
}


def at_epoch(path, epoch=30, metric="recall@10"):
    rows = [json.loads(line) for line in open(path)]
    for r in rows:
        if r.get("epoch") == epoch and metric in r:
            return r[metric]
    return None


def main():
    # curve-level noise: residual of prod100's recall@10 vs a 3-pt moving avg
    rows = [json.loads(line) for line in open(os.path.join(RES, "quality_prod100.jsonl"))]
    r10 = np.array([r["recall@10"] for r in rows if r.get("epoch")])
    ma = np.convolve(r10, np.ones(3) / 3, mode="valid")
    sigma = float((r10[1:-1] - ma).std())
    print(f"single-eval sigma (prod100 detrended): {sigma:.4f}")
    print()
    print(f"{'lever':10s} {'n':>2s} {'recall@10@30 mean':>18s} {'spread(ptp)':>12s}  finals")
    base = None
    for lever, pats in LEVERS.items():
        vals = []
        for pat in pats:
            for f in sorted(glob.glob(os.path.join(RES, pat))):
                v = at_epoch(f)
                if v is not None:
                    vals.append(v)
        if not vals:
            continue
        m, ptp = float(np.mean(vals)), float(np.ptp(vals))
        if lever == "prod":
            base = (m, ptp)
        print(f"{lever:10s} {len(vals):2d} {m:18.4f} {ptp:12.4f}  {[round(v, 4) for v in vals]}")
    if base:
        print()
        print(
            f"neutrality band: |lever_mean - prod_mean| vs prod ptp {base[1]:.4f}"
            f" + 2*sigma {2 * sigma:.4f}"
        )


if __name__ == "__main__":
    main()
