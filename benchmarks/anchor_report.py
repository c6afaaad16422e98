"""Summarize the 20k x 10k torch-anchor record (benchmarks/results/
anchor20k_*.jsonl) into the PERF.md comparison table: per-side final metrics,
seed spread, and the torch/TPU agreement gap. Pure file reader — rerunnable by
anyone to check the committed record.

Usage: python benchmarks/anchor_report.py
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

RES = os.path.join(os.path.dirname(__file__), "results")


def finals(pattern):
    out = {}
    for f in sorted(glob.glob(os.path.join(RES, pattern))):
        rows = [json.loads(line) for line in open(f)]
        evals = [r for r in rows if r.get("epoch")]
        if evals:
            out[os.path.basename(f)] = evals[-1]
    return out


def curve(path):
    rows = [json.loads(line) for line in open(os.path.join(RES, path))]
    return [(r["epoch"], r["recall@10"]) for r in rows if r.get("epoch")]


def main():
    for model in ("textsage", "lgn", "sasrec"):
        print(f"== {model} ==")
        for side in ("tpu", "torch"):
            fin = finals(f"anchor20k_{model}_{side}_s*.jsonl")
            if not fin:
                print(f"  {side}: (no runs recorded)")
                continue
            r10 = np.array([v["recall@10"] for v in fin.values()])
            r20 = np.array([v["recall@20"] for v in fin.values()])
            print(
                f"  {side}: n={len(fin)} recall@10 {r10.mean():.4f}"
                f" (ptp {np.ptp(r10):.4f})  recall@20 {r20.mean():.4f}"
                f"  finals={[round(float(x), 4) for x in r10]}"
            )
        t = finals(f"anchor20k_{model}_tpu_s*.jsonl")
        o = finals(f"anchor20k_{model}_torch_s*.jsonl")
        if t and o:
            gt = np.mean([v["recall@10"] for v in t.values()])
            go = np.mean([v["recall@10"] for v in o.values()])
            print(f"  gap(recall@10): {abs(gt - go):.4f}")
    print()
    print("== feature signal (informative vs ablated/noise, round 5) ==")
    for side in ("tpu", "torch"):
        inf = finals(f"anchor20k_textsage_{side}_inf_s*.jsonl")
        noi = finals(f"anchor20k_textsage_{side}_s*.jsonl")
        if inf:
            ri = np.array([v["recall@10"] for v in inf.values()])
            line = f"  {side} informative: n={len(inf)} recall@10 {ri.mean():.4f}"
            if noi:
                rn = np.mean([v["recall@10"] for v in noi.values()])
                line += f"  (ablated {rn:.4f}, lift {ri.mean() / rn:.1f}x)"
            print(line + "  [popularity 0.0444]")
    print()
    print("per-curve plateau wobble (single-eval sigma):")
    for f in sorted(glob.glob(os.path.join(RES, "anchor20k_*_s0.jsonl"))):
        pts = curve(os.path.basename(f))
        if len(pts) >= 5:
            vals = np.array([v for _, v in pts[-6:]])
            print(f"  {os.path.basename(f)}: std {vals.std():.4f}")


if __name__ == "__main__":
    main()
