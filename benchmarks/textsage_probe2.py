"""Flagship TextSAGE step — round-3 probes (dev script).

Questions, at the PERF.md flagship shape (100k x 30k, B=5000, n/w/t, d=32,
L=2, fanout 5, epoch-cached tables; step = 15.05 ms full / 6.5 fwd /
+3.3 table-cotangent scatter / +5.1 feature-VJP):

  pretrees   Is in-scan tree sampling scheduled badly (like the 10.7x epoch-
             sampling pathology)? Presample every step's fanout trees in a
             standalone program, scan the step over them.
  presample  What does that standalone tree presampling cost per step?
  tvjp       Standalone initial_tables fwd vs fwd+pullback (isolates the
             feature-VJP's per-call cost from the in-scan number).
  scatter    The 465k-row table-cotangent scatter: 9 level-scatters (current
             shape) vs ONE fused scatter over concatenated indices.

Run from the repo root: python benchmarks/textsage_probe2.py [variant ...]
"""

from __future__ import annotations

import sys

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

from spmm_bench import log, timeit  # noqa: E402

NB = 40


def main():
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

    # ---- presampled trees for every step (standalone program) ----
    def presample(key, graph, batches):
        keys = jax.random.split(key, 3)
        seeds_sides = (
            (batches.user, "user"), (batches.pos, "item"), (batches.neg, "item")
        )
        trees = []
        for i, (seeds, side) in enumerate(seeds_sides):
            tr = model.sample_seed_tree(graph, seeds.reshape(-1), side, keys[i])
            # leaves [NB*bs, ...] -> [NB, bs, ...] so the scan slices per step
            tr = jax.tree_util.tree_map(
                lambda x: x.reshape((NB, bs) + x.shape[1:]), tr
            )
            trees.append(tr)
        return tuple(trees)

    presample_j = jax.jit(presample)

    def make_epoch(variant, with_trees):
        def epoch(params, opt_state, key, graph, bound, batches, trees):
            with model.bind(bound):
                tables0, tables_vjp = jax.vjp(model.initial_tables, params)

                def cached_loss(p, t, batch, k, tr):
                    return model.loss(p, graph, batch, k, tables=t, trees=tr)

                def step_full(carry, inp):
                    params, opt_state = carry
                    batch, k, tr = inp
                    (loss, _), (g_p, g_t) = jax.value_and_grad(
                        cached_loss, argnums=(0, 1), has_aux=True
                    )(params, tables0, batch, k, tr)
                    (g_feat,) = tables_vjp(g_t)
                    grads = jax.tree_util.tree_map(jnp.add, g_p, g_feat)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state), loss

                def step_fwd(carry, inp):
                    params, opt_state = carry
                    batch, k, tr = inp
                    loss, _ = cached_loss(params, tables0, batch, k, tr)
                    return (params, opt_state), loss

                def step_scatter(carry, inp):
                    # full minus feature-VJP (the scatter_only shape of probe 1)
                    params, opt_state, acc = carry
                    batch, k, tr = inp
                    (loss, _), (g_p, g_t) = jax.value_and_grad(
                        cached_loss, argnums=(0, 1), has_aux=True
                    )(params, tables0, batch, k, tr)
                    acc = jax.tree_util.tree_map(jnp.add, acc, g_t)
                    updates, opt_state = opt.update(g_p, opt_state, params)
                    return (optax.apply_updates(params, updates), opt_state, acc), loss

                keys = jax.random.split(key, NB)
                inp = (batches, keys, trees)
                if variant == "scatter":
                    acc0 = jax.tree_util.tree_map(jnp.zeros_like, tables0)
                    (params, opt_state, acc), losses = lax.scan(
                        step_scatter, (params, opt_state, acc0), inp
                    )
                    return params, opt_state, jnp.mean(losses) + acc[0][0, 0] * 1e-20
                step = {"full": step_full, "fwd": step_fwd}[variant]
                (params, opt_state), losses = lax.scan(
                    step, (params, opt_state), inp
                )
                return params, opt_state, jnp.mean(losses)

        if not with_trees:
            def epoch_notrees(params, opt_state, key, graph, bound, batches):
                none_trees = (None, None, None)
                # thread literal Nones by closing over them (not scanned)
                with model.bind(bound):
                    tables0, tables_vjp = jax.vjp(model.initial_tables, params)

                    def cached_loss(p, t, batch, k):
                        return model.loss(p, graph, batch, k, tables=t, trees=None)

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

                    def step_fwd(carry, inp):
                        params, opt_state = carry
                        batch, k = inp
                        loss, _ = cached_loss(params, tables0, batch, k)
                        return (params, opt_state), loss

                    step = {"full": step_full, "fwd": step_fwd}[variant]
                    keys = jax.random.split(key, NB)
                    (params, opt_state), losses = lax.scan(
                        step, (params, opt_state), (batches, keys)
                    )
                    return params, opt_state, jnp.mean(losses)

            return jax.jit(epoch_notrees)
        return jax.jit(epoch)

    which = set(sys.argv[1:]) or {"pretrees", "presample", "tvjp", "scatter"}

    if "pretrees" in which:
        trees = presample_j(jax.random.PRNGKey(7), graph, batches)
        trees = jax.block_until_ready(trees)
        for variant in ("fwd", "full", "scatter"):
            fn = make_epoch(variant, with_trees=True)
            dt = timeit(
                fn,
                lambda i: (params, opt_state, jax.random.PRNGKey(100 + i),
                           graph, bound, batches, trees),
                iters=3,
            )
            log(bench="ts_pretrees", variant=variant, step_ms=round(dt / NB * 1e3, 2))
        for variant in ("fwd", "full"):
            fn = make_epoch(variant, with_trees=False)
            dt = timeit(
                fn,
                lambda i: (params, opt_state, jax.random.PRNGKey(100 + i),
                           graph, bound, batches),
                iters=3,
            )
            log(bench="ts_insample", variant=variant, step_ms=round(dt / NB * 1e3, 2))

    if "presample" in which:
        dt = timeit(
            presample_j,
            lambda i: (jax.random.PRNGKey(i), graph, batches),
            iters=5,
        )
        log(bench="ts_presample", ms=round(dt * 1e3, 2),
            per_step_ms=round(dt / NB * 1e3, 2))

    if "tvjp" in which:
        def fwd_only(params, bound):
            with model.bind(bound):
                u, i = model.initial_tables(params)
                return u.sum() + i.sum()

        def fwd_pull(params, bound, gu, gi):
            with model.bind(bound):
                _, pull = jax.vjp(model.initial_tables, params)
                (g,) = pull((gu, gi))
                return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        nu, mi, d = 100_000, 30_000, model.node_dim
        gu = jax.random.normal(jax.random.PRNGKey(3), (nu, d))
        gi = jax.random.normal(jax.random.PRNGKey(4), (mi, d))
        f1 = jax.jit(fwd_only)
        f2 = jax.jit(fwd_pull)
        d1 = timeit(f1, lambda i: (params, bound), iters=20)
        d2 = timeit(f2, lambda i: (params, bound, gu * (1 + i), gi), iters=20)
        log(bench="ts_tvjp", fwd_ms=round(d1 * 1e3, 2),
            fwd_pull_ms=round(d2 * 1e3, 2),
            pull_ms=round((d2 - d1) * 1e3, 2))

    if "scatter" in which:
        # 465k rows into [130k, 32]: 9 level-shaped scatters vs 1 fused
        N, d = 130_000, 32
        sizes = [5000, 25000, 125000] * 3
        key = jax.random.PRNGKey(5)
        idxs = [
            jax.random.randint(jax.random.fold_in(key, i), (n,), 0, N)
            for i, n in enumerate(sizes)
        ]
        rows = [
            jax.random.normal(jax.random.fold_in(key, 100 + i), (n, d))
            for i, n in enumerate(sizes)
        ]
        fused_idx = jnp.concatenate(idxs)
        fused_rows = jnp.concatenate(rows)

        def split_scatter(idxs, rows, c):
            out = jnp.zeros((N, d))
            for ix, r in zip(idxs, rows):
                out = out.at[ix].add(r * c)
            return out

        def fused_scatter(idx, r, c):
            return jnp.zeros((N, d)).at[idx].add(r * c)

        REP = 20

        def rep(fn):
            def run(c0, *args):
                def body(i, c):
                    return fn(*args, c)[0, 0] * 1e-9 + c
                return lax.fori_loop(0, REP, body, c0)
            return jax.jit(run)

        def fused_scatter_bf16(idx, r, c):
            # the "bf16 tables0/cotangent" lever: accumulate in bf16
            out = jnp.zeros((N, d), jnp.bfloat16).at[idx].add(
                (r * c).astype(jnp.bfloat16)
            )
            return out.astype(jnp.float32)

        f_split = rep(lambda a, b, c: split_scatter(idxs, rows, c))
        f_fused = rep(lambda a, b, c: fused_scatter(a, b, c))
        f_bf16 = rep(lambda a, b, c: fused_scatter_bf16(a, b, c))
        d_split = timeit(f_split, lambda i: (jnp.float32(i), fused_idx, fused_rows), iters=5) / REP
        d_fused = timeit(f_fused, lambda i: (jnp.float32(i), fused_idx, fused_rows), iters=5) / REP
        d_bf16 = timeit(f_bf16, lambda i: (jnp.float32(i), fused_idx, fused_rows), iters=5) / REP
        log(bench="ts_scatter", split_ms=round(d_split * 1e3, 2),
            fused_ms=round(d_fused * 1e3, 2),
            fused_bf16_ms=round(d_bf16 * 1e3, 2))


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
