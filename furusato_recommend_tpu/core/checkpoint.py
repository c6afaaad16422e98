"""Checkpoint / resume.

Improves on the reference's ``torch.save(state_dict)``-only checkpoints
(`/root/reference/trainer.py:219-234`), which lose optimizer moments, RNG, and the
step counter on resume (SURVEY.md §5.4): here a checkpoint is the full training
state — params + optax state + PRNG key + step + best-metric + config JSON —
serialized either as an .npz of leaves plus a pickled treedef (``backend="npz"``,
single portable file) or through **orbax** (``backend="orbax"``, a checkpoint
directory: pickle-free, safe to load from untrusted sources, stable across
jax/optax versions — SURVEY.md §5.3/5.4 rebuild goal). ``load_checkpoint``
auto-detects the backend from the path (directory = orbax).

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

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_path", "restructure"]


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


def save_checkpoint(
    path: str | Path,
    state: Dict[str, Any],
    config: Optional[Config] = None,
    backend: str = "npz",
) -> None:
    if backend == "orbax":
        return _save_orbax(path, state, config)
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r} (npz | orbax)")
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


def _save_orbax(path, state, config) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path) if path.is_dir() else path.unlink()
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), state)
    ocp.PyTreeCheckpointer().save(path, host_state)  # atomic: tmp dir + rename
    if config is not None:
        (path / "framework_config.json").write_text(config.to_json())


def restructure(template, raw):
    """Re-impose a pytree structure (e.g. optax NamedTuple states) onto an
    orbax-restored plain-container tree. Relies on leaf-order isomorphism:
    orbax restores NamedTuples as dicts whose alphabetical key order matches
    the field order for optax's states (count/mu/nu) — verified by the
    orbax round-trip + resume tests."""
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(raw)
    if len(t_leaves) != len(r_leaves):
        raise ValueError(
            f"restructure: template has {len(t_leaves)} leaves, raw has {len(r_leaves)}"
        )
    return jax.tree_util.tree_unflatten(t_def, r_leaves)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    path = Path(path)
    if path.is_dir():  # orbax backend
        import orbax.checkpoint as ocp

        cfg_file = path / "framework_config.json"
        cfg_json = cfg_file.read_text() if cfg_file.exists() else None
        state = ocp.PyTreeCheckpointer().restore(str(path.absolute()))
        state.pop("framework_config", None)
        if cfg_json:
            state["__config__"] = json.loads(cfg_json)
        return state
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload["treedef"])
    npz = np.load(io.BytesIO(payload["npz"]))
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    if payload.get("config"):
        state["__config__"] = json.loads(payload["config"])
    return state
