"""Decompose the bench.py headline epoch (lgn d=64 L=2 B=8192) on the REAL
bench graph: sampler / one SpMM apply / loss fwd / full step (grad+adam).

spmm_asym_probe measured fwd == bwd == ~4.8 ms on a synthetic Zipf-item graph
whose USER destinations all fall below the dense break-even — but the headline
epoch implies ~12.5 ms/step, i.e. ~3 apply-equivalents for what should be 4
applies. This probe times the actual pieces on the actual graph. One JSON line
per measurement; run from the repo root on the real chip.
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

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import _apply  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import BPRBatch  # noqa: E402

_RPC_BASELINE = None


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])


def rpc_baseline():
    global _RPC_BASELINE
    if _RPC_BASELINE is None:
        x = jnp.zeros((8,))
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(x + 1.0)
        _RPC_BASELINE = (time.perf_counter() - t0) / 5
    return _RPC_BASELINE


def timeit(fn, make_arg, iters=3):
    base = rpc_baseline()
    out = fn(*make_arg(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_arg(1 + i))
    _sync(out)
    return max(time.perf_counter() - t0 - base, 1e-9) / iters


def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
    f1, f2 = make_prog(r1), make_prog(r2)
    t1 = timeit(f1, make_arg, iters=iters)
    t2 = timeit(f2, make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def log(**kw):
    print(json.dumps(kw), flush=True)


def rep_pytree(body):
    """Chain R dependent applications over an [N, d] carry; extra operands flow
    as arguments (never closed over — remote-compile payload limit)."""

    def make(R):
        def run(a, x, i):
            x = x + jnp.float32(i) * 1e-9

            def step(c, _):
                return body(a, c) * (1.0 - 1e-12), None

            y, _ = lax.scan(step, x, None, length=R)
            return y

        return jax.jit(run)

    return make


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    cfg = Config(model="lgn", latent_dim=64, n_layers=2, bpr_batch_size=8192, lr=1e-3)
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    g = ds.graph
    adj = g.norm_padded.fwd
    tail_slots = sum(a.shape[0] * a.shape[1] for a in adj.bucket_nbrs)
    log(
        bench="shape",
        edges=int(g.train_size),
        tail_pad_slots=int(tail_slots),
        dst_hub=0 if adj.dst_hub_ids is None else int(adj.dst_hub_ids.shape[0]),
        src_hub=0 if adj.hub_ids is None else int(adj.hub_ids.shape[0]),
    )
    model = build_model("lgn", cfg, g)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    N, d = g.num_nodes, cfg.latent_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)

    # 1. one SpMM apply on the real normalized adjacency
    dt = per_op(rep_pytree(lambda a, z: _apply(a, z, jnp.bfloat16)), lambda i: (adj, x, i))
    log(bench="lgn_step", variant="one_apply", ms=round(dt * 1e3, 2))

    # 2. full loss fwd (propagate L=2 + batch gathers + bpr)
    B = cfg.bpr_batch_size
    batch = BPRBatch(
        user=jnp.asarray(rng.integers(0, g.n_users, B), jnp.int32),
        pos=jnp.asarray(rng.integers(0, g.m_items, B), jnp.int32),
        neg=jnp.asarray(rng.integers(0, g.m_items, B), jnp.int32),
        valid=jnp.ones((B,), bool),
    )
    key = jax.random.PRNGKey(1)

    def fwd_make(R):
        def run(params, gg, batch, i):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda t: t * (1.0 - 1e-12), c)
                loss, _ = model.loss(p, gg, batch, key)
                p = jax.tree_util.tree_map(lambda t: t + loss * 1e-20, p)
                return p, None

            p, _ = lax.scan(step, params, None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(fwd_make, lambda i: (params, g, batch, i))
    log(bench="lgn_step", variant="loss_fwd", ms=round(dt * 1e3, 2))

    # 2b. propagate-only grad (isolates SpMM fwd+bwd chain from the loss tail)
    def prop_grad_make(R):
        def run(params, gg, i):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda t: t * (1.0 - 1e-12), c)
                g = jax.grad(
                    lambda q: sum(
                        jnp.sum(e * jax.lax.stop_gradient(e))
                        for e in model.propagate(q, gg)
                    )
                )(p)
                return g, None

            p, _ = lax.scan(step, params, None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(prop_grad_make, lambda i: (params, g, i))
    log(bench="lgn_step", variant="propagate_grad", ms=round(dt * 1e3, 2))

    # 2c. gather-VJP scatter alone: d/dtable sum(table[ids] * sg(gathered)) is a
    # scatter-add of B rows into the table — unsorted vs pre-sorted ids
    tbl = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    ids_u = jnp.asarray(rng.integers(0, N, 3 * B), jnp.int32)
    ids_s = jnp.sort(ids_u)

    def scat_make(R):
        def run(tbl, ids, i):
            tbl = tbl + jnp.float32(i) * 1e-9

            def step(c, _):
                gfn = jax.grad(
                    lambda t: jnp.sum(t[ids] * jax.lax.stop_gradient(t[ids] + 1.0))
                )
                return gfn(c) * (1.0 - 1e-12), None

            y, _ = lax.scan(step, tbl, None, length=R)
            return y

        return jax.jit(run)

    dt = per_op(scat_make, lambda i: (tbl, ids_u, i))
    log(bench="lgn_step", variant="gather_vjp_unsorted_24k", ms=round(dt * 1e3, 2))
    dt = per_op(scat_make, lambda i: (tbl, ids_s, i))
    log(bench="lgn_step", variant="gather_vjp_sorted_24k", ms=round(dt * 1e3, 2))

    # 2d. sort + sorted-segment-sum formulation of the same scatter
    import jax.ops as jops

    def seg_make(R):
        def run(tbl, ids, i):
            tbl = tbl + jnp.float32(i) * 1e-9

            def step(c, _):
                gv = c[ids] + 1.0
                order = jnp.argsort(ids)
                out = jops.segment_sum(
                    gv[order], ids[order], num_segments=N, indices_are_sorted=True
                )
                return c * (1.0 - 1e-12) + out * 1e-20, None

            y, _ = lax.scan(step, tbl, None, length=R)
            return y

        return jax.jit(run)

    dt = per_op(seg_make, lambda i: (tbl, ids_u, i))
    log(bench="lgn_step", variant="sort_plus_segment_sum_24k", ms=round(dt * 1e3, 2))

    # 3. full train step: value_and_grad + adam
    def step_make(R):
        def run(params, opt_state, gg, batch, i):
            def step(carry, _):
                p, s = carry
                (loss, _aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                    p, gg, batch, key
                )
                updates, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), None

            (p, s), _ = lax.scan(step, (params, opt_state), None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(step_make, lambda i: (params, opt_state, g, batch, i))
    log(bench="lgn_step", variant="full_step", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
