"""SPMD training-step builder: pjit over the (data, model) mesh.

This is the TPU-native equivalent of the reference's whole distributed layer L4
(`ddp.py` / `multi_process.py` / `model/ddp_sage.py`, SURVEY.md §2.7):

- batch arrays are sharded over ``data`` (DDP's per-rank batches),
- embedding tables are row-sharded over ``model`` (new capability — the
  (n+m) x d tables dominate memory),
- the gradient all-reduce that DDP installs via backward hooks
  (`/root/reference/ddp.py:797`) is emitted by XLA from the sharding
  propagation; no hand-written collectives.

The per-host divergent-sampling trick of the reference
(``np.random.seed(1000*rank)``, `/root/reference/ddp.py:768`) becomes explicit
``jax.random.fold_in(key, host_id)`` in the input pipeline.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import optax

from ..config import Config
from ..core.mesh import batch_sharding, replicated, shard_params
from ..data.graph import BipartiteGraph
from ..models.base import PairwiseModel
from ..sampling.bpr import BPRBatch

__all__ = ["make_sharded_train_step", "shard_batch"]


def shard_batch(batch: BPRBatch, mesh) -> BPRBatch:
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, bs), batch)


def make_sharded_train_step(
    model: PairwiseModel,
    graph: BipartiteGraph,
    config: Config,
    mesh,
    optimizer: optax.GradientTransformation,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn).

    init_fn(key) -> (params, opt_state) placed on the mesh.
    step_fn(params, opt_state, batch, key) -> (params, opt_state, loss); jitted,
    with batch sharded over the data axis and tables row-sharded over model.
    """

    def init_fn(key):
        params = model.init(key)
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        return params, opt_state

    def step_fn(params, opt_state, batch: BPRBatch, key):
        (loss, _aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, graph, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rep = replicated(mesh)
    bspec = batch_sharding(mesh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(None, None, jax.tree_util.tree_map(lambda _: bspec, BPRBatch(0, 0, 0, 0)), rep),
        donate_argnums=(0, 1),
    )
    return init_fn, jitted
