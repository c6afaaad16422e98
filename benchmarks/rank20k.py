"""Two-stage retrieval -> re-rank pipeline at flagship shape, on chip
(round-4 verdict #2: the reference's whole second stage exists to improve
top-10 — `/root/reference/train_lgbm.py:176-188`, `eval_lgbm.py:67-117` — and
the NeuralRanker had only a 100-user toy test).

Protocol (the reference's, at 20k x 10k):
1. lgbm split: per user, hold out the LAST ``len*lgbm_ratio/0.7`` train items
   (`/root/reference/dataloader.py:100-105` slicing — lgbm_ratio 0.1).
2. Train both retrievers (lgn companion recipe + TextSAGE flagship recipe) on
   the REDUCED train set; dump each retriever's per-user top-50.
3. Label the candidate union with the held-out slice (train_lgbm.py:102-130)
   and fit the NeuralRanker (LambdaRank pairwise MLP).
4. Re-train both retrievers on the FULL train set, dump top-50 again, re-rank
   the union with the stage-3 ranker, and score rerank recall@10 / ndcg@10 on
   the test split vs each retriever alone (eval_lgbm.py:67-117).

Features default to the informative latent-derived artifacts — the ranker's
make_X consumes numeric+categorical only, so with noise features the second
stage cannot beat the retriever on principle (nothing to rank BY); with
informative ones the comparison is meaningful on both frameworks' designs.

Also records ranker fit wall time and the in-program-repetition device time of
the rank() request path (the serving-side number PERF.md's table wants).

Results -> benchmarks/results/rank20k.jsonl (one JSON row per record).
Usage (repo root, real chip): python benchmarks/rank20k.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "benchmarks")

from anchor20k import load_dataset, make_features  # noqa: E402


def lgbm_split(ds, ratio=0.1):
    """Per-user suffix holdout in train-edge order: keep the first
    ``len - int(len*ratio/0.7)`` items of each user's train list, hold out the
    rest (the reference's for_lgbm slicing applied to an in-memory Dataset)."""
    from furusato_recommend_tpu.data.dataset import Dataset

    n = ds.n_users
    order = np.argsort(ds.train_user, kind="stable")
    tu, ti = ds.train_user[order], ds.train_item[order]
    deg = np.bincount(tu, minlength=n)
    starts = np.cumsum(deg) - deg
    pos_in_row = np.arange(len(tu)) - starts[tu]
    valid_len = (deg * ratio / 0.7).astype(int)
    keep = pos_in_row < (deg - valid_len)[tu]
    reduced = Dataset(
        n_users=n, m_items=ds.m_items,
        train_user=tu[keep], train_item=ti[keep],
        test_user=ds.test_user, test_item=ds.test_item,
    )
    return reduced, (tu[~keep], ti[~keep])


def train_retriever(ds, feats, model_name, epochs, seed=0, cache=""):
    from furusato_recommend_tpu.config import Config, ddp_flagship_config
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.train.trainer import Trainer

    if model_name == "textsage":
        cfg = ddp_flagship_config().replace(
            eval_user_batch=2048, topks=(10, 20), seed=seed, epochs=epochs,
            compile_cache=cache,
        )
        model = build_model("textsage", cfg, ds.graph, features=feats)
    else:
        cfg = Config(
            model="lgn", latent_dim=32, bpr_batch_size=2048, lr=0.01,
            decay=1e-7, eval_user_batch=2048, topks=(10, 20), seed=seed,
            epochs=epochs, compile_cache=cache,
        )
        model = build_model("lgn", cfg, ds.graph)
    tr = Trainer(cfg, ds, model, ddp_recipe=(model_name == "textsage"))
    params, opt_state = tr.init_state(seed=seed)
    for ep in range(epochs):
        params, opt_state, loss = tr.train_one_epoch(
            params, opt_state, prefetch_next=ep + 1 < epochs
        )
    return model, tr, params


def candidate_topk_recall(cand, eval_dict, m, k=10):
    """recall@k / ndcg@k of the FIRST k candidates (dump order is score-sorted)
    — the retriever-alone number under the identical candidate protocol."""
    users = np.asarray(sorted(eval_dict.keys()), np.int64)
    top = np.asarray(cand, np.int64)[users, :k]
    gt_keys = np.sort(np.concatenate(
        [np.int64(u) * m + np.asarray(eval_dict[int(u)], np.int64) for u in users]
    ))
    gt_lens = np.asarray([len(eval_dict[int(u)]) for u in users], np.float64)
    hit = np.isin(users[:, None] * m + top, gt_keys)
    disc = 1.0 / np.log2(2.0 + np.arange(k))
    dcg = (hit * disc[None, :]).sum(axis=1)
    idcg = np.cumsum(disc)[np.maximum(np.minimum(gt_lens.astype(int), k), 1) - 1]
    return {
        f"recall@{k}": float(np.mean(hit.sum(1) / np.maximum(gt_lens, 1.0))),
        f"ndcg@{k}": float(np.mean(dcg / idcg)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", default="informative", choices=["noise", "informative"])
    ap.add_argument("--retriever_epochs", type=int, default=30)
    ap.add_argument("--ranker_epochs", type=int, default=40)
    ap.add_argument("--lgbm_ratio", type=float, default=0.1)
    ap.add_argument("--k_cand", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU (dev only)")
    ap.add_argument("--small", action="store_true",
                    help="2000x1000 smoke shape (dev only; same generator "
                         "seed/rank so informative features stay aligned)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.rank.pipeline import (
        build_rank_groups,
        dump_candidates,
        rerank_eval,
    )
    from furusato_recommend_tpu.rank.ranker import NeuralRanker

    sfx = "_small" if args.small else ("_cpu" if args.cpu else "")
    out_path = os.path.join(
        os.path.dirname(__file__), "results", f"rank20k{sfx}.jsonl"
    )
    f = open(out_path, "w")

    def emit(**row):
        print(json.dumps(row), flush=True)
        f.write(json.dumps(row) + "\n")
        f.flush()

    t_start = time.time()
    if args.small:
        from furusato_recommend_tpu.data.dataset import synthetic_structured_dataset

        ds = synthetic_structured_dataset(
            n_users=2000, m_items=1000, avg_degree=8, seed=0,
            rank=16, signal=3.0, popularity_alpha=0.8,
        )
    else:
        ds = load_dataset()
    feat_cfg = Config(user_feature="nwtc", item_feature="nwtc")
    feats = make_features(ds, feat_cfg, args.features)
    emit(meta=True, features=args.features, n_users=ds.n_users,
         m_items=ds.m_items, train_edges=ds.train_size,
         lgbm_ratio=args.lgbm_ratio, k_cand=args.k_cand,
         retriever_epochs=args.retriever_epochs, ranker_epochs=args.ranker_epochs)

    cache = "/tmp/rank20k_xla_cache"

    # ---- stage A: ranker training data from the reduced-train retrievers ----
    ds_l, held = lgbm_split(ds, args.lgbm_ratio)
    emit(stage="lgbm_split", reduced_edges=ds_l.train_size, held_edges=len(held[0]))
    cands_l = []
    for name in ("lgn", "textsage"):
        t0 = time.time()
        model, tr, params = train_retriever(
            ds_l, feats, name, args.retriever_epochs, seed=args.seed, cache=cache
        )
        cand = dump_candidates(model, params, ds_l.graph, k=args.k_cand, batch=2048)
        cands_l.append(cand)
        emit(stage="A", retriever=name, train_s=round(time.time() - t0, 1))

    groups = build_rank_groups(ds_l, cands_l, holdout=held)
    # the aux variant trains on holdout-labeled CANDIDATES only: the
    # reference protocol's appended train positives (train_lgbm.py:124-126)
    # are masked out of every dump by construction, so retriever-signal
    # columns anti-correlate with that majority positive label (measured:
    # rerank_aux 0.191 < parity 0.199 when trained on the full protocol);
    # candidates-only groups ARE the eval distribution.
    groups_aux = build_rank_groups(ds_l, cands_l, holdout=held,
                                   include_train_positives=False,
                                   with_retriever_aux=True)
    emit(stage="groups", n_groups=int(groups.users.shape[0]),
         width=int(groups.items.shape[1]),
         n_groups_aux=int(groups_aux.users.shape[0]))

    # two rankers: reference-parity make_X (static profiles, reference
    # protocol groups) and the retriever-signal variant
    # (rank/pipeline.py retriever_rank_aux — flagged Deviation)
    ranker = NeuralRanker(feats)
    ranker_aux = NeuralRanker(feats, aux_dim=int(groups_aux.aux.shape[-1]))
    # hold ~20% of the aux groups out of the fit for post-hoc calibration
    import jax as _jax

    fit_rows = np.asarray(groups_aux.users) % 5 != 0
    groups_aux_fit = _jax.tree_util.tree_map(lambda a: a[fit_rows], groups_aux)
    rparams = rparams_aux = None
    for tag, rk, gr in (("ref", ranker, groups),
                        ("aux", ranker_aux, groups_aux_fit)):
        t0 = time.time()
        p = rk.fit(gr, epochs=args.ranker_epochs, batch_groups=256,
                   lr=1e-3, seed=args.seed,
                   aux_warm_epochs=15 if tag == "aux" else 0)
        # force queue drain with a dependent scalar fetch (block_until_ready
        # does NOT wait over the axon tunnel — CLAUDE.md gotcha)
        float(jnp.sum(p["b3"]))
        fit_s = time.time() - t0
        G = int(gr.users.shape[0])
        emit(stage="ranker_fit", variant=tag, fit_s=round(fit_s, 1),
             groups_per_s=round(G * args.ranker_epochs / fit_s, 1))
        if tag == "ref":
            rparams = p
        else:
            rparams_aux = p

    # ---- stage B: full-train retrievers + final rerank eval ----
    eval_dict = ds.test_dict()
    cands_f = []
    for name in ("lgn", "textsage"):
        t0 = time.time()
        model, tr, params = train_retriever(
            ds, feats, name, args.retriever_epochs, seed=args.seed, cache=cache
        )
        cand = dump_candidates(model, params, ds.graph, k=args.k_cand, batch=2048)
        cands_f.append(cand)
        alone = candidate_topk_recall(cand, eval_dict, ds.m_items, k=10)
        trainer_eval = {k: v for k, v in tr.test(params).items()
                        if k in ("recall@10", "ndcg@10")}
        emit(stage="B", retriever=name, train_s=round(time.time() - t0, 1),
             **{f"alone_{k}": round(v, 5) for k, v in alone.items()},
             **{f"trainer_{k}": round(v, 5) for k, v in trainer_eval.items()})

    res = rerank_eval(ranker, rparams, ds, cands_f, eval_dict, k=10)
    emit(stage="rerank", **{k: round(v, 5) for k, v in res.items()})
    res_aux = rerank_eval(ranker_aux, rparams_aux, ds, cands_f, eval_dict, k=10)
    emit(stage="rerank_aux", **{k: round(v, 5) for k, v in res_aux.items()},
         wa=[round(float(x), 4) for x in np.asarray(rparams_aux["wa"])])

    # ---- val-calibrated stack (NeuralRanker.calibrate) ----
    import jax as _jax

    val_rows = np.asarray(groups_aux.users) % 5 == 0  # ~20% val users
    g_val = _jax.tree_util.tree_map(lambda a: a[val_rows], groups_aux)
    rparams_cal = ranker_aux.calibrate(rparams_aux, g_val, k=10)
    beta, gamma, val_r = [float(x) for x in np.asarray(rparams_cal["_calibration"])]
    res_cal = rerank_eval(ranker_aux, rparams_cal, ds, cands_f, eval_dict, k=10)
    emit(stage="rerank_stack", beta=beta, gamma=gamma,
         val_recall=round(val_r, 5),
         **{k: round(v, 5) for k, v in res_cal.items()})

    # ---- diagnostics: is the retriever signal recoverable at all? ----
    from furusato_recommend_tpu.rank.pipeline import (
        _compact_rows,
        _dedup_rows,
        retriever_rank_aux,
    )

    users_e = np.asarray(sorted(eval_dict.keys()), np.int64)
    cand_e = np.concatenate(
        [np.asarray(c, np.int64)[users_e] for c in cands_f], axis=1
    )
    keep_e = _dedup_rows(cand_e, np.ones_like(cand_e, dtype=bool))
    aux_e = retriever_rank_aux(
        [np.asarray(c, np.int64)[users_e] for c in cands_f], cand_e, ds.m_items
    )
    kept_e, (cm_e, am_e) = _compact_rows(keep_e, cand_e, aux_e, width=160)
    for j, name in enumerate(("lgn", "textsage")):
        s = np.where(kept_e, am_e[..., 2 * j], -np.inf)
        order = np.argsort(-s, axis=1)[:, :10]
        top = np.take_along_axis(cm_e, order, axis=1)
        ok = np.take_along_axis(kept_e, order, axis=1)
        top = np.where(ok & (np.take_along_axis(s, order, axis=1) > 0), top, -1)
        gt_keys = np.sort(np.concatenate(
            [np.int64(u) * ds.m_items + np.asarray(eval_dict[int(u)], np.int64)
             for u in users_e]
        ))
        gt_lens = np.asarray(
            [len(eval_dict[int(u)]) for u in users_e], np.float64
        )
        hit = np.isin(
            np.where(top >= 0, users_e[:, None] * ds.m_items + top, -1), gt_keys
        ) & (top >= 0)
        emit(stage="diag_rr_only", retriever=name,
             recall_at_10=round(float(np.mean(
                 hit.sum(1) / np.maximum(gt_lens, 1.0))), 5))
    # stage-A pairwise AUC of each aux column (does the training signal even
    # point the right way?)
    ga = groups_aux
    lab = np.asarray(ga.labels) * np.asarray(ga.mask)
    msk = np.asarray(ga.mask)
    aux_tr = np.asarray(ga.aux)
    for j in range(aux_tr.shape[-1]):
        v = aux_tr[..., j]
        pos = (lab > 0) & msk
        neg = (lab == 0) & msk
        # row-wise mean of P(v_pos > v_neg) + 0.5 P(=)
        num = den = 0.0
        for r in range(0, v.shape[0], 1):
            pv, nv = v[r][pos[r]], v[r][neg[r]]
            if len(pv) and len(nv):
                gt = (pv[:, None] > nv[None, :]).sum()
                eq = (pv[:, None] == nv[None, :]).sum()
                num += gt + 0.5 * eq
                den += len(pv) * len(nv)
        emit(stage="diag_aux_auc", col=j, auc=round(num / max(den, 1.0), 4))

    # union-oracle ceiling: recall if the ranker ordered the union perfectly
    users = np.asarray(sorted(eval_dict.keys()), np.int64)
    m = ds.m_items
    union = np.concatenate([np.asarray(c, np.int64)[users] for c in cands_f], axis=1)
    gt_keys = np.sort(np.concatenate(
        [np.int64(u) * m + np.asarray(eval_dict[int(u)], np.int64) for u in users]
    ))
    gt_lens = np.asarray([len(eval_dict[int(u)]) for u in users], np.float64)
    in_union = np.isin(users[:, None] * m + union, gt_keys)
    # ceiling counts each distinct held-out item once (union may duplicate)
    ceil = []
    for r in range(len(users)):
        hits = set(union[r][in_union[r]].tolist())
        ceil.append(min(len(hits), 10) / max(gt_lens[r], 1.0))
    emit(stage="union_ceiling", recall_at_10_ceiling=round(float(np.mean(ceil)), 5))

    # ---- serving-side device time of the ranker request path ----
    from spmm_bench import timeit  # noqa: E402

    C = union.shape[1]
    cand_dev = jnp.asarray(union[:4096].astype(np.int32))
    mask_dev = jnp.ones_like(cand_dev, dtype=bool)

    @jax.jit
    def rank_batch(users, items, mask):
        return ranker.rank(rparams, users, items, k=10, mask=mask)

    u0 = jnp.asarray(users[:4096].astype(np.int32))
    dt = timeit(
        lambda i: rank_batch((u0 + i) % ds.n_users, cand_dev, mask_dev),
        lambda i: (i,), iters=20,
    )
    emit(stage="rank_latency", batch=4096, cand_width=C,
         device_ms=round(dt * 1e3, 3),
         users_per_s=round(4096 / dt, 1))

    emit(done=True, total_s=round(time.time() - t_start, 1))
    f.close()


if __name__ == "__main__":
    main()
