"""Reproduce the reference's DDP flagship training run (`/root/reference/ddp.py:758-906`)
on TPU: TextSAGE recdim=32/L=2/fanout=5, batch 5000, 3x dataset-size weighted+
capped sampling per epoch, warm-start from the last checkpoint when present,
eval + checkpoint + result CSV every TEST_SPAN epochs.

The reference needed 6 GPUs, NCCL process groups, per-rank RNG seeds, and
rank-0-only eval; here the same recipe is one process — scale across chips by
passing --mesh_data/--mesh_model (XLA inserts the collectives).

Usage (real data):    python examples/train_flagship.py --data_path ./data
Usage (synthetic):    python examples/train_flagship.py --synthetic
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from furusato_recommend_tpu.config import ddp_flagship_config
from furusato_recommend_tpu.core.checkpoint import checkpoint_path
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.obs.log import MetricLogger, cprint
from furusato_recommend_tpu.train.trainer import Trainer

TEST_SPAN = 5  # /root/reference/ddp.py:37


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default="./data")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--mesh_data", type=int, default=1,
                    help="data-parallel mesh axis (replaces the reference's DDP ranks)")
    ap.add_argument("--mesh_model", type=int, default=1,
                    help="model axis: embedding tables row-sharded across chips")
    args = ap.parse_args()

    from furusato_recommend_tpu.config import MeshConfig

    config = ddp_flagship_config().replace(
        data_path=args.data_path,
        epochs=args.epochs,
        test_span=TEST_SPAN,
        mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
    )

    if args.synthetic:
        from furusato_recommend_tpu.data import synthetic_dataset
        from furusato_recommend_tpu.data.features import synthetic_features

        dataset = synthetic_dataset(n_users=20_000, m_items=8_000, avg_degree=20, seed=0)
        features = synthetic_features(dataset, config, seed=0)
    else:
        from furusato_recommend_tpu.data import load_text_dataset
        from furusato_recommend_tpu.data.features import load_reference_features

        dataset = load_text_dataset(config)
        features = load_reference_features(config, config.data_path)

    model = build_model(config.model, config, dataset.graph, features=features)
    logger = MetricLogger(jsonl_path=f"{config.path}/{config.model}/flagship.jsonl")
    trainer = Trainer(config, dataset, model, logger=logger, ddp_recipe=True)

    state = None
    ckpt = checkpoint_path(config)
    if ckpt.exists():
        # warm-start (the reference reloads the last checkpoint at process
        # start, ddp.py:791-795 — here with optimizer/PRNG state included)
        state = trainer.restore(ckpt)
        cprint(f"warm-started from {ckpt} at epoch {trainer.step}")

    trainer.fit(epochs=config.epochs, state=state)


if __name__ == "__main__":
    main()
