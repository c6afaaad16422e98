"""Committed flagship-scale anchor record stays consistent (round-4 verdict
#1): the 20k x 10k torch-oracle curves and the TPU curves in
benchmarks/results/anchor20k_*.jsonl must agree at their final evals. A
regenerable record check — `python benchmarks/anchor_report.py` prints the
table; `python benchmarks/anchor20k.py --side {torch,tpu}` regenerates a run.

Tolerances: single-eval plateau sigma is ~0.0018 (anchor_report.py); the
3-sigma band on a mean-vs-single-final comparison is ~0.008. A transposed
conv, a broken sampler, or a stale-gradient regression moves recall@10 by
5-100x that (cf. the relin collapse, PERF.md).
"""

import glob
import json
import os

import numpy as np
import pytest

RES = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "results")


def _finals(pattern, metric="recall@10"):
    """Mean of the LAST THREE evals per completed run — single-eval plateau
    wobble is the dominant noise (sigma ~0.002-0.004 at this shape), so the
    3-eval mean is the robust per-run statistic."""
    vals = []
    for f in sorted(glob.glob(os.path.join(RES, pattern))):
        rows = [json.loads(line) for line in open(f)]
        evals = [r[metric] for r in rows if r.get("epoch")]
        last = [r for r in rows if r.get("epoch")]
        if last and last[-1]["epoch"] >= 30:  # completed runs only
            vals.append(float(np.mean(evals[-3:])))
    return vals


def test_anchor20k_textsage_record_agrees():
    tpu = _finals("anchor20k_textsage_tpu_s*.jsonl")
    oracle = _finals("anchor20k_textsage_torch_s*.jsonl")
    if not (tpu and oracle):
        pytest.skip("anchor record incomplete (runs in progress)")
    gap = abs(float(np.mean(tpu)) - float(np.mean(oracle)))
    assert gap <= 0.008, (tpu, oracle)
    # both sides genuinely at the flagship recipe's plateau (a broken run
    # lands near 0 or collapses; cf. quality_prod_r0)
    assert min(tpu) > 0.03 and min(oracle) > 0.03, (tpu, oracle)
    # TPU seeds are tight: the recipe is stable across seeds at this scale
    assert np.ptp(tpu) < 0.006, tpu


def test_anchor20k_lgn_record_agrees():
    tpu = _finals("anchor20k_lgn_tpu_s*.jsonl")
    oracle = _finals("anchor20k_lgn_torch_s*.jsonl")
    if not (tpu and oracle):
        pytest.skip("anchor record incomplete (runs in progress)")
    gap = abs(float(np.mean(tpu)) - float(np.mean(oracle)))
    assert gap <= 0.008, (tpu, oracle)
    # lgn beats the popularity baseline (0.0444 on this dataset) ~2x — the
    # collaborative signal is real on both sides
    assert min(tpu) > 0.08 and min(oracle) > 0.08, (tpu, oracle)


def _finals_min_epoch(pattern, min_epoch, metric="recall@10"):
    """_finals with an explicit completion bar (the torch informative run is
    15 epochs by design — its plateau is established by epoch ~9)."""
    vals = []
    for f in sorted(glob.glob(os.path.join(RES, pattern))):
        rows = [json.loads(line) for line in open(f)]
        evals = [r[metric] for r in rows if r.get("epoch")]
        last = [r for r in rows if r.get("epoch")]
        if last and last[-1]["epoch"] >= min_epoch:
            vals.append(float(np.mean(evals[-3:])))
    return vals


#: popularity-ranking recall@10 on the 20k x 10k structured dataset (PERF.md
#: "flagship-scale torch anchor" table) — the no-model baseline both
#: frameworks must clear.
POPULARITY_R10 = 0.0444


def test_anchor20k_feature_signal_ordering():
    """Round-4 verdict #1: the feature machinery is a LEARNING win, not just
    gradient parity. With latent-derived (informative) artifacts the flagship
    recipe must beat both the feature-ablated run (identical interactions,
    i.i.d.-noise artifacts — the `_s*` curves) and the popularity baseline,
    by a margin far outside the 0.008 noise band — on BOTH frameworks
    (`/root/reference/model/textsage.py:291-352` is the capability claimed)."""
    tpu_inf = _finals("anchor20k_textsage_tpu_inf_s*.jsonl")
    torch_inf = _finals_min_epoch("anchor20k_textsage_torch_inf_s*.jsonl", 15)
    tpu_noise = _finals("anchor20k_textsage_tpu_s*.jsonl")
    torch_noise = _finals("anchor20k_textsage_torch_s*.jsonl")
    if not (tpu_inf and torch_inf and tpu_noise and torch_noise):
        pytest.skip("feature-signal anchor incomplete (runs in progress)")
    # featured > 3x ablated and > 3x popularity, both frameworks
    assert min(tpu_inf) > 3 * max(tpu_noise), (tpu_inf, tpu_noise)
    assert min(tpu_inf) > 3 * POPULARITY_R10, tpu_inf
    assert min(torch_inf) > 2 * max(torch_noise), (torch_inf, torch_noise)
    assert min(torch_inf) > 2 * POPULARITY_R10, torch_inf
    # TPU informative seeds agree with each other (recipe stable)
    if len(tpu_inf) > 1:
        assert np.ptp(tpu_inf) < 0.02, tpu_inf


def test_anchor20k_sasrec_record_agrees():
    """SASRec chip record (round-4 verdict #3): the TPU SASRec and the
    clean-room torch-oracle SASRec agree at their training plateaus under the
    reference defaults (d=64, len-50, L=2 — `/root/reference/model/sasrec.py:
    385-448`). Absolute recall is low by design: the structured dataset's
    signal is a static latent affinity, which a next-item sequence objective
    only partially captures — agreement, not magnitude, is the claim."""
    tpu = _finals("anchor20k_sasrec_tpu_s*.jsonl")
    oracle = _finals("anchor20k_sasrec_torch_s*.jsonl")
    if not (tpu and oracle):
        pytest.skip("sasrec anchor incomplete (runs in progress)")
    gap = abs(float(np.mean(tpu)) - float(np.mean(oracle)))
    assert gap <= 0.012, (tpu, oracle)
    # both sides actually learned something (cold init scores ~1/M)
    assert min(tpu) > 0.005 and min(oracle) > 0.005, (tpu, oracle)


def test_rank20k_record_rerank_wins():
    """Two-stage record (round-4 verdict #2), committed chip run at 20k x 10k:

    - the val-calibrated retriever-signal stack (retriever_rank_aux columns
      + NeuralRanker.calibrate, flagged Deviation) must beat the best
      retriever alone — the reference's entire second stage exists to
      improve top-10 (`/root/reference/train_lgbm.py:176-188`,
      `eval_lgbm.py:67-117`); committed record: 0.22985 vs 0.21118 (+8.8%);
    - the reference-parity ranker (static-profile make_X only,
      train_lgbm.py:46-63) must beat the WEAKER retriever — with no
      retriever-derived columns it cannot represent the graph knowledge of
      the stronger one (the measured reason the aux columns exist)."""
    path = os.path.join(RES, "rank20k.jsonl")
    if not os.path.exists(path):
        pytest.skip("rank20k record not generated yet")
    rows = [json.loads(line) for line in open(path)]
    alone = [r["alone_recall@10"] for r in rows if r.get("stage") == "B"]
    rer = [r for r in rows if r.get("stage") == "rerank"]
    stack = [r for r in rows if r.get("stage") == "rerank_stack"]
    if not (alone and rer and stack):
        pytest.skip("rank20k record incomplete")
    assert stack[0]["rerank_recall@10"] >= max(alone) - 1e-9, (stack[0], alone)
    assert stack[0]["rerank_ndcg@10"] >= 0.164, stack[0]
    assert rer[0]["rerank_recall@10"] >= min(alone) - 1e-9, (rer[0], alone)
    ceil = [r for r in rows if r.get("stage") == "union_ceiling"]
    if ceil:
        top = ceil[0]["recall_at_10_ceiling"] + 1e-9
        assert rer[0]["rerank_recall@10"] <= top
        assert stack[0]["rerank_recall@10"] <= top
    # rr-only diagnostics reproduce each retriever's alone ordering exactly —
    # the aux plumbing is lossless
    diag = {r["retriever"]: r["recall_at_10"] for r in rows
            if r.get("stage") == "diag_rr_only"}
    if diag:
        assert abs(diag["textsage"] - max(alone)) < 1e-4
        assert abs(diag["lgn"] - min(alone)) < 1e-4


def test_scale500k_record_throughput():
    """10x-scale record (round-4 verdict #5): at 500k users / 15M+ edges the
    lgn headline path still runs at a sane fraction of the 50k-graph headline
    (sampling is O(1)/triplet; propagation grows with edges, so some drop is
    physics — a 10x collapse would mean the hub design does not scale)."""
    path = os.path.join(RES, "scale500k.jsonl")
    if not os.path.exists(path):
        pytest.skip("scale500k record not generated yet")
    rows = [json.loads(line) for line in open(path)]
    steady = [r for r in rows if r.get("stage") == "steady" and r.get("part") == "lgn"]
    if not steady:
        pytest.skip("scale500k lgn record incomplete")
    assert steady[-1]["samples_per_s"] > 100_000, steady[-1]
    hbm = [r for r in rows if str(r.get("stage", "")).startswith("hbm_")
           and r.get("part") == "lgn"]
    if hbm and "peak_mib" in hbm[-1]:
        assert hbm[-1]["peak_mib"] < 14_000, hbm[-1]  # headroom on a 16G chip


def test_anchor20k_model_ordering_consistent():
    """The cross-model ordering (lgn >> featureless-feature textsage on this
    latent-structure dataset) reproduces on BOTH frameworks — algorithm-level
    differences dwarf the framework gap, which is the anchor's point."""
    ts_tpu = _finals("anchor20k_textsage_tpu_s*.jsonl")
    ts_torch = _finals("anchor20k_textsage_torch_s*.jsonl")
    lgn_tpu = _finals("anchor20k_lgn_tpu_s*.jsonl")
    lgn_torch = _finals("anchor20k_lgn_torch_s*.jsonl")
    if not (ts_tpu and ts_torch and lgn_tpu and lgn_torch):
        pytest.skip("anchor record incomplete (runs in progress)")
    assert np.mean(lgn_tpu) > 2 * np.mean(ts_tpu)
    assert np.mean(lgn_torch) > 2 * np.mean(ts_torch)
