"""Why does the Trainer's compiled epoch run ~21 ms/step when the isolated
step probe (textsage_probe.py) measures 15 ms/step at identical shapes?

Times the REAL Trainer._train_epoch (ddp_recipe flagship, 421 steps) against
ablations:

  trainer          the production epoch exactly as bench runs it
  no_negalias      same but neg_alias=None (uniform negatives)
  no_sample        sampling hoisted out (presampled fixed batches, scan only)
  short_scan       no_sample with a 40-step scan (the probe's NB)

One JSON line per measurement; run from the repo root:
    python benchmarks/trainer_epoch_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import BPRBatch, sample_bpr  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402

from spmm_bench import log, timeit  # noqa: E402


def main():
    # donation off so re-invoking the epoch with the same buffers is legal
    cfg = ddp_flagship_config().replace(
        eval_user_batch=2048, topks=(10, 20), donate_params=False
    )
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, model, ddp_recipe=True)
    params, opt_state = tr.init_state()
    nb = tr.samples_per_epoch // cfg.bpr_batch_size
    bs = cfg.bpr_batch_size
    graph = tr.graph
    bound = tr._bound
    log(bench="setup", nb=nb, bs=bs)

    # 1. the production path: sample program + scan program (two dispatches)
    prod = tr._train_epoch

    def run_prod(params, opt_state, key):
        batches = tr._sample_epoch(key, graph, (tr.edge_alias, tr.neg_alias))
        p, o, loss = prod(params, opt_state, key, graph, batches, bound)
        return loss

    dt = timeit(run_prod, lambda i: (params, opt_state, jax.random.PRNGKey(i)), iters=3)
    log(bench="trainer_epoch", variant="trainer", epoch_s=round(dt, 3), step_ms=round(dt / nb * 1e3, 2))

    # 2. neg_alias off
    def run_noneg(params, opt_state, key):
        batches = tr._sample_epoch(key, graph, (tr.edge_alias, None))
        p, o, loss = prod(params, opt_state, key, graph, batches, bound)
        return loss

    dt = timeit(run_noneg, lambda i: (params, opt_state, jax.random.PRNGKey(i)), iters=3)
    log(bench="trainer_epoch", variant="no_negalias", epoch_s=round(dt, 3), step_ms=round(dt / nb * 1e3, 2))

    # 3/4. sampling hoisted out: probe-style scan over presampled batches
    import optax

    opt = tr.optimizer

    def make_scan(n_steps):
        def epoch_fn(params, opt_state, key, graph, bound, batches):
            with model.bind(bound):
                tables0, tables_vjp = jax.vjp(model.initial_tables, params)

                def cached_loss(p, t, batch, k):
                    return model.loss(p, graph, batch, k, tables=t)

                def step(carry, inp):
                    params, opt_state = carry
                    batch, k = inp
                    (loss, _), (g_p, g_t) = jax.value_and_grad(
                        cached_loss, argnums=(0, 1), has_aux=True
                    )(params, tables0, batch, k)
                    (g_feat,) = tables_vjp(g_t)
                    grads = jax.tree_util.tree_map(jnp.add, g_p, g_feat)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state), loss

                keys = jax.random.split(key, n_steps)
                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), (batches, keys)
                )
                return jnp.mean(losses)

        return jax.jit(epoch_fn)

    for n_steps, name in ((nb, "no_sample"), (40, "short_scan")):
        s = sample_bpr(
            jax.random.PRNGKey(1), graph, n_steps * bs,
            neg_candidates=cfg.neg_candidates, edge_alias=tr.edge_alias,
        )
        batches = BPRBatch(
            user=s.user.reshape(n_steps, bs), pos=s.pos.reshape(n_steps, bs),
            neg=s.neg.reshape(n_steps, bs), valid=s.valid.reshape(n_steps, bs),
        )
        fn = make_scan(n_steps)
        dt = timeit(
            fn,
            lambda i: (params, opt_state, jax.random.PRNGKey(100 + i), graph, bound, batches),
            iters=3,
        )
        log(
            bench="trainer_epoch", variant=name, n_steps=n_steps,
            epoch_s=round(dt, 3), step_ms=round(dt / n_steps * 1e3, 2),
        )


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
