"""Auxiliary CLIs — the reference's `test.py` / `eval.py` / `train_lgbm.py` /
`eval_lgbm.py` entry points as subcommands:

  python -m furusato_recommend_tpu.tools dump-candidates --ckpt ... --k 50
  python -m furusato_recommend_tpu.tools evaluate --ckpt ...
  python -m furusato_recommend_tpu.tools recommend --ckpt ... --users 3,17 --k 10
  python -m furusato_recommend_tpu.tools train-ranker --candidates a.npy b.npy
  python -m furusato_recommend_tpu.tools rerank-eval --candidates a.npy b.npy --ranker r.ckpt

Reference flows: `test.py:23-41` (checkpoint -> top-50 dump), `eval.py`
(checkpoint -> metrics), `train_lgbm.py:66-191` (candidates -> LambdaRank fit),
`eval_lgbm.py:47-117` (candidate union -> predict -> top-10).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _load_run(args):
    import jax

    from .cli import build_argparser, config_from_args
    from .core.checkpoint import load_checkpoint
    from .data import load_text_dataset
    from .models.registry import build_model

    state = load_checkpoint(args.ckpt)
    cfg_json = state.get("__config__")
    from .config import Config

    config = Config.from_json(json.dumps(cfg_json)) if cfg_json else config_from_args(
        build_argparser().parse_args([])
    )
    if args.data_path:
        config = config.replace(data_path=args.data_path)
    dataset = load_text_dataset(config)
    from .cli import build_model_inputs

    graph, model_kw = build_model_inputs(config, dataset)
    model = build_model(config.model, config, graph, **model_kw)
    params = jax.tree_util.tree_map(jax.numpy.asarray, state["params"])
    return config, dataset, model, params


def cmd_dump_candidates(args):
    from .rank.pipeline import dump_candidates

    config, dataset, model, params = _load_run(args)
    cands = dump_candidates(model, params, dataset.graph, k=args.k)
    out = args.out or f"candidates_{config.model}.npy"
    np.save(out, cands)
    print(f"wrote {out} shape={cands.shape}")


def cmd_evaluate(args):
    from .eval.evaluate import Evaluator, build_eval_data

    config, dataset, model, params = _load_run(args)
    max_deg = int(np.max(np.bincount(dataset.train_user, minlength=dataset.n_users)))
    ev = Evaluator(model, dataset.graph, config, max_train_degree=max_deg)
    data = build_eval_data(dataset, config.eval_user_batch)
    results, topk = ev(params, data)
    print(json.dumps({k: round(v, 6) for k, v in results.items()}, indent=2))
    if args.save_result:
        from .eval.results import save_result

        save_result(args.save_result, dataset, topk, k=config.topks[0])
        print(f"wrote {args.save_result}")


def cmd_infer(args):
    """ddp_inference.py equivalent: checkpoint -> full-graph inference over the
    INFERENCE edge set (train+test for --suffix all) -> targeted per-user CSVs."""
    from .eval.inference import production_inference

    config, dataset, model, params = _load_run(args)
    if not dataset.has_inference_edges:
        print(
            "[infer] no separate inference edge set (need --suffix all or an "
            "inference{suffix}.txt); propagating over train edges"
        )
    target = [int(t) for t in args.target_batches.split(",") if t != ""]
    paths = production_inference(
        model,
        params,
        dataset,
        config,
        out_dir=args.out_dir,
        user_batch_size=args.user_batch,
        target_batches=target,
        k=args.k,
    )
    print(f"wrote {len(paths)} csv(s)")


def cmd_recommend(args):
    """Online-serving one-shot: checkpoint -> cached propagated embeddings ->
    masked top-K for the requested users (serve.Recommender)."""
    from .serve import Recommender

    rec = Recommender.from_checkpoint(
        args.ckpt,
        data_path=args.data_path,
        use_inference_edges=not args.train_edges_only,
    )
    users = [int(u) for u in args.users.split(",") if u != ""]
    ids, scores = rec.recommend(users, k=args.k)
    for u, row, srow in zip(users, ids, scores):
        print(json.dumps({"user": u, "items": row.tolist(),
                          "scores": [round(float(s), 4) for s in srow]}))


def cmd_train_ranker(args):
    import jax

    from .core.checkpoint import save_checkpoint
    from .config import Config
    from .data import load_text_dataset
    from .data.features import load_reference_features
    from .rank.pipeline import build_rank_groups
    from .rank.ranker import NeuralRanker

    config = Config(data_path=args.data_path, for_lgbm=True, lgbm_ratio=args.lgbm_ratio,
                    user_feature="nc", item_feature="nc")  # make_X needs cat+numeric
    dataset = load_text_dataset(config)
    features = load_reference_features(config, config.data_path)
    # held-out = the lgbm slice: full edge set minus the for_lgbm-train edge
    # set, one flat-key setdiff over the COO arrays (no per-user Python loop)
    full = load_text_dataset(config.replace(for_lgbm=False))
    m = np.int64(full.m_items)
    key_full = full.train_user.astype(np.int64) * m + full.train_item
    key_train = dataset.train_user.astype(np.int64) * m + dataset.train_item
    held_keys = np.setdiff1d(key_full, key_train)
    held = (held_keys // m, held_keys % m)
    cands = [np.load(p) for p in args.candidates]
    groups = build_rank_groups(dataset, cands, holdout=held)
    ranker = NeuralRanker(features)
    params = ranker.fit(groups, epochs=args.epochs, verbose=True)
    save_checkpoint(args.out, {"params": params}, config)
    print(f"wrote {args.out}")


def cmd_rerank_eval(args):
    from .core.checkpoint import load_checkpoint
    from .config import Config
    from .data import load_text_dataset
    from .data.features import load_reference_features
    from .rank.pipeline import rerank_eval
    from .rank.ranker import NeuralRanker

    config = Config(data_path=args.data_path, user_feature="nc", item_feature="nc")
    dataset = load_text_dataset(config)
    features = load_reference_features(config, config.data_path)
    ranker = NeuralRanker(features)
    params = load_checkpoint(args.ranker)["params"]
    cands = [np.load(p) for p in args.candidates]
    results = rerank_eval(ranker, params, dataset, cands, dataset.test_dict(), k=args.k)
    print(json.dumps(results, indent=2))


def cmd_preprocess(args):
    """preprocessing_main.py equivalent (`/root/reference/preprocessing_main.py:12-126`):
    raw dataframes -> ID dedup -> categorical/numeric/text/category features ->
    optional incremental update round -> training-ready artifact directory
    (+ cf/train.txt / cf/test.txt interaction splits)."""
    import pandas as pd

    from .preprocessing.pipeline import run_preprocessing

    def _read(path):
        if path is None:
            return None
        if path.endswith(".pkl"):
            return pd.read_pickle(path)
        return pd.read_csv(path)

    summary = run_preprocessing(
        _read(args.products),
        _read(args.customers),
        _read(args.transactions),
        args.out,
        product_category=_read(args.product_category),
        partner=_read(args.partner),
        reviews=_read(args.reviews),
        suffix=args.suffix,
        incremental_frac=args.incremental_frac,
        test_holdout=args.test_holdout,
    )
    print(json.dumps(summary, indent=2))


def cmd_convert_recbole(args):
    import pandas as pd

    from .preprocessing.filtering import k_core, write_recbole

    def _read(path):
        if path is None:
            return None
        return pd.read_pickle(path) if path.endswith(".pkl") else pd.read_csv(path)

    inter = _read(args.interactions)
    if args.k_core > 1:
        before = len(inter)
        inter = k_core(inter, args.k_core, item_col=args.item_col,
                       user_col=args.user_col, iterate=args.iterate)
        print(f"k_core({args.k_core}): {before} -> {len(inter)} interactions")
    extra = [c for c in args.extra_inter_cols.split(",") if c]
    dropped = [c for c in inter.columns
               if c not in (args.user_col, args.item_col, *extra)]
    if dropped:
        print(f"[convert-recbole] dropping interaction columns {dropped} "
              f"(pass --extra_inter_cols to keep them)")
    types = dict(kv.split("=", 1) for kv in args.types.split(",") if kv)
    written = write_recbole(
        args.out, args.name, inter, users=_read(args.users), items=_read(args.items),
        item_col=args.item_col, user_col=args.user_col,
        extra_inter_cols=extra, types=types,
    )
    print(json.dumps(written, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="furusato_recommend_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump-candidates", help="test.py equivalent: checkpoint -> top-k dump")
    d.add_argument("--ckpt", required=True)
    d.add_argument("--k", type=int, default=50)
    d.add_argument("--out", default=None)
    d.add_argument("--data_path", default=None)
    d.set_defaults(fn=cmd_dump_candidates)

    e = sub.add_parser("evaluate", help="eval.py equivalent: checkpoint -> metrics")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--data_path", default=None)
    e.add_argument("--save_result", default=None, help="also write per-user CSV")
    e.set_defaults(fn=cmd_evaluate)

    i = sub.add_parser(
        "infer", help="ddp_inference.py equivalent: checkpoint -> per-user CSVs"
    )
    i.add_argument("--ckpt", required=True)
    i.add_argument("--data_path", default=None)
    i.add_argument("--out_dir", default="./data/result")
    i.add_argument("--user_batch", type=int, default=1000)
    i.add_argument(
        "--target_batches",
        default="0",
        help="comma-separated user-batch indices (reference ran 1000,5000,8500)",
    )
    i.add_argument("--k", type=int, default=20)
    i.set_defaults(fn=cmd_infer)

    s = sub.add_parser(
        "recommend", help="online serving one-shot: checkpoint -> top-K per user"
    )
    s.add_argument("--ckpt", required=True)
    s.add_argument("--users", required=True, help="comma-separated user ids")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--data_path", default=None)
    s.add_argument("--train_edges_only", action="store_true",
                   help="propagate over train edges even if an inference edge set exists")
    s.set_defaults(fn=cmd_recommend)

    t = sub.add_parser("train-ranker", help="train_lgbm.py equivalent")
    t.add_argument("--candidates", nargs="+", required=True)
    t.add_argument("--data_path", default="./data")
    t.add_argument("--lgbm_ratio", type=float, default=0.1)
    t.add_argument("--epochs", type=int, default=30)
    t.add_argument("--out", default="./ranker.ckpt")
    t.set_defaults(fn=cmd_train_ranker)

    r = sub.add_parser("rerank-eval", help="eval_lgbm.py equivalent")
    r.add_argument("--candidates", nargs="+", required=True)
    r.add_argument("--ranker", required=True)
    r.add_argument("--data_path", default="./data")
    r.add_argument("--k", type=int, default=10)
    r.set_defaults(fn=cmd_rerank_eval)

    pp = sub.add_parser(
        "preprocess",
        help="preprocessing_main.py equivalent: raw dataframes -> artifact dir",
    )
    pp.add_argument("--products", required=True, help=".csv or .pkl product frame")
    pp.add_argument("--customers", required=True)
    pp.add_argument("--transactions", required=True)
    pp.add_argument("--product_category", default=None)
    pp.add_argument("--partner", default=None)
    pp.add_argument("--reviews", default=None)
    pp.add_argument("--out", required=True, help="artifact directory (becomes --data_path)")
    pp.add_argument("--suffix", default="")
    pp.add_argument("--incremental_frac", type=float, default=0.1,
                    help="fraction of every input pushed through update() after "
                         "initialize (the reference's OFFSET slicing; 0 disables)")
    pp.add_argument("--test_holdout", type=int, default=1,
                    help="last-k interactions per user written to cf/test.txt")
    pp.set_defaults(fn=cmd_preprocess)

    c = sub.add_parser(
        "convert-recbole",
        help="README conversion_tools equivalent: dataframes -> RecBole atomic files"
        " (optionally k-core filtered first)",
    )
    c.add_argument("--interactions", required=True, help=".csv or .pkl dataframe")
    c.add_argument("--users", default=None)
    c.add_argument("--items", default=None)
    c.add_argument("--out", required=True)
    c.add_argument("--name", default="furusato")
    c.add_argument("--k_core", type=int, default=1, help="5/10 = README five_core/ten_core")
    c.add_argument("--iterate", action="store_true", help="iterate k-core to fixpoint")
    c.add_argument("--user_col", default="customer_id")
    c.add_argument("--item_col", default="remap_id")
    c.add_argument("--extra_inter_cols", default="",
                   help="comma-separated interaction columns to keep beyond "
                        "user/item (e.g. rating,timestamp)")
    c.add_argument("--types", default="",
                   help="col=type overrides, comma-separated; namespace with "
                        "table. for per-table types (e.g. "
                        "timestamp=float,user.timestamp=token)")
    c.set_defaults(fn=cmd_convert_recbole)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
