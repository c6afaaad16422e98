"""Checkpoint / resume.

Improves on the reference's ``torch.save(state_dict)``-only checkpoints
(`/root/reference/trainer.py:219-234`), which lose optimizer moments, RNG, and the
step counter on resume (SURVEY.md §5.4): here a checkpoint is the full training
state — params + optax state + PRNG key + step + best-metric + config JSON —
serialized as an .npz of leaves plus a pickled treedef, fully host-portable.

Path-scheme parity with the reference
(``{path}/{model}/{recdim}_{layer}_{suffix}_{run}.ckpt``) is provided by
``checkpoint_path``. A best-by-recall policy lives in the Trainer, as in the
reference (`/root/reference/trainer.py:178-180`).
"""

from __future__ import annotations

import io
import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import Config

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_path"]


def checkpoint_path(config: Config, run_name: str = "") -> Path:
    """Reference path scheme (`checkpoint_save_path`,
    /root/reference/trainer.py:219-231), with the lgbm-split variant."""
    base = Path(config.path) / config.model
    run = run_name or config.wandb or "run"
    if config.for_lgbm:
        name = f"{config.latent_dim}_{config.n_layers}_{config.suffix}_{config.lgbm_ratio}_{run}.ckpt"
    else:
        name = f"{config.latent_dim}_{config.n_layers}_{config.suffix}_{run}.ckpt"
    return base / name


def save_checkpoint(path: str | Path, state: Dict[str, Any], config: Optional[Config] = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    payload = {
        "treedef": pickle.dumps(treedef),
        "npz": buf.getvalue(),
        "config": config.to_json() if config is not None else None,
    }
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    tmp.rename(path)  # atomic — preemption-safe (SURVEY.md §5.3 rebuild goal)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload["treedef"])
    npz = np.load(io.BytesIO(payload["npz"]))
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    if payload.get("config"):
        state["__config__"] = json.loads(payload["config"])
    return state
