"""Flagship TextSAGE train-step breakdown on the real chip (dev probe).

Where do the ~25 ms/step go at the PERF.md flagship shape (100k x 30k, B=5000,
n/w/t, d=32, L=2, fanout 5, epoch-cached initial tables)? Variants eliminate
one stage at a time:

  full          the Trainer's cached train_step (grads -> tables_vjp -> adam)
  tables_const  stop_gradient(tables): no dense g_t scatter, no tables_vjp
  fwd_only      loss value only (no backward at all)
  no_dropout    full, with neighbor dropout disabled (RNG + where cost)
  tables_fwd    initial_tables() forward alone (per call; once per epoch)
  tables_vjp    the epoch-linearization VJP alone (per call; once per step)
  sample_epoch  sample_bpr for a whole epoch (amortize over num_batches)

Dev script (one JSON line per measurement), run from the repo root:
    python benchmarks/textsage_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import BPRBatch, sample_bpr  # noqa: E402
from furusato_recommend_tpu.sampling.weights import (  # noqa: E402
    capped_positive_edge_weights,
    edge_alias_from_weights,
)

from spmm_bench import log, timeit  # noqa: E402  (same timing discipline)

NB = 40  # steps per probe program (1s+ of work >> 25 ms RPC noise)


def main():
    import furusato_recommend_tpu.models.sage as sage_mod

    cfg = ddp_flagship_config().replace(topks=(10, 20))
    bs = cfg.bpr_batch_size
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    opt = optax.adam(cfg.lr)
    graph = ds.graph
    bound = model.data_to_bind()

    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    # one epoch's worth of batches, fixed across variants
    w = capped_positive_edge_weights(ds, NB * bs, cfg.positive_num_limit)
    alias = edge_alias_from_weights(w)
    s = sample_bpr(
        jax.random.PRNGKey(1), graph, NB * bs,
        neg_candidates=cfg.neg_candidates, edge_alias=alias,
    )
    batches = BPRBatch(
        user=s.user.reshape(NB, bs), pos=s.pos.reshape(NB, bs),
        neg=s.neg.reshape(NB, bs), valid=s.valid.reshape(NB, bs),
    )

    def make_epoch(variant):
        def epoch(params, opt_state, key, graph, bound, batches):
            with model.bind(bound):
                tables0, tables_vjp = jax.vjp(model.initial_tables, params)

                def cached_loss(p, t, batch, k):
                    return model.loss(p, graph, batch, k, tables=t)

                def step_full(carry, inp):
                    params, opt_state = carry
                    batch, k = inp
                    (loss, _), (g_p, g_t) = jax.value_and_grad(
                        cached_loss, argnums=(0, 1), has_aux=True
                    )(params, tables0, batch, k)
                    (g_feat,) = tables_vjp(g_t)
                    grads = jax.tree_util.tree_map(jnp.add, g_p, g_feat)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state), loss

                def step_tables_const(carry, inp):
                    params, opt_state = carry
                    batch, k = inp
                    (loss, _), g_p = jax.value_and_grad(
                        lambda p, b, kk: cached_loss(
                            p, jax.lax.stop_gradient(tables0), b, kk
                        ),
                        has_aux=True,
                    )(params, batch, k)
                    updates, opt_state = opt.update(g_p, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state), loss

                def step_fwd(carry, inp):
                    params, opt_state = carry
                    batch, k = inp
                    loss, _ = cached_loss(params, tables0, batch, k)
                    return (params, opt_state), loss

                step = {
                    "full": step_full,
                    "tables_const": step_tables_const,
                    "fwd_only": step_fwd,
                }.get(variant)
                keys = jax.random.split(key, NB)
                if variant == "scatter_only":
                    # materialize dense g_t each step (the gather-VJP scatter)
                    # but skip tables_vjp: accumulating g_t in the carry forces
                    # the scatter without the feature backward
                    def step_scatter(carry, inp):
                        params, opt_state, acc = carry
                        batch, k = inp
                        (loss, _), (g_p, g_t) = jax.value_and_grad(
                            cached_loss, argnums=(0, 1), has_aux=True
                        )(params, tables0, batch, k)
                        acc = jax.tree_util.tree_map(jnp.add, acc, g_t)
                        updates, opt_state = opt.update(g_p, opt_state, params)
                        return (
                            optax.apply_updates(params, updates),
                            opt_state,
                            acc,
                        ), loss

                    acc0 = jax.tree_util.tree_map(jnp.zeros_like, tables0)
                    (params, opt_state, acc), losses = lax.scan(
                        step_scatter, (params, opt_state, acc0), (batches, keys)
                    )
                    return params, opt_state, jnp.mean(losses) + acc[0][0, 0] * 1e-20
                (params, opt_state), losses = lax.scan(
                    step, (params, opt_state), (batches, keys)
                )
                return params, opt_state, jnp.mean(losses)

        return jax.jit(epoch)

    which = [a for a in sys.argv[1:] if not a.startswith("-")]
    for variant in which or ("full", "fwd_only", "tables_const", "scatter_only"):
        fn = make_epoch(variant)
        dt = timeit(
            fn,
            lambda i: (params, opt_state, jax.random.PRNGKey(100 + i), graph, bound, batches),
            iters=3,
        )
        log(bench="textsage_step", variant=variant, step_ms=round(dt / NB * 1e3, 2))

    if which:
        return
    # dropout off (trace-time constant)
    old = sage_mod.DROPOUT_RATE
    sage_mod.DROPOUT_RATE = 0.0
    try:
        fn = make_epoch("full")
        dt = timeit(
            fn,
            lambda i: (params, opt_state, jax.random.PRNGKey(100 + i), graph, bound, batches),
            iters=3,
        )
        log(bench="textsage_step", variant="full_no_dropout", step_ms=round(dt / NB * 1e3, 2))
    finally:
        sage_mod.DROPOUT_RATE = old

    # epoch sampling, amortized per step
    samp = jax.jit(
        lambda k, g, a: sample_bpr(
            k, g, NB * bs, neg_candidates=cfg.neg_candidates, edge_alias=a
        )
    )
    dt = timeit(samp, lambda i: (jax.random.PRNGKey(i), graph, alias), iters=5)
    log(
        bench="textsage_stage",
        stage="sample_epoch",
        ms=round(dt * 1e3, 2),
        per_step_ms=round(dt / NB * 1e3, 2),
    )


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
