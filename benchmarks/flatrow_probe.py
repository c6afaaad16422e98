"""Probe: does flattening the [n_b, cap]-shaped ROW gather in the padded SpMM
help like flattening scalar gathers did (sampler_bench)? Compares the adopted
_apply (shaped gather) against a per-bucket flattened-gather variant at the
adopted config (src-hub 1024 + dst-hub). One JSON line per measurement."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    PaddedAdjPair,
    build_padded_adj,
)

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
    t1 = timeit(make_prog(r1), make_arg, iters=iters)
    t2 = timeit(make_prog(r2), make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def log(**kw):
    print(json.dumps(kw), flush=True)


def apply_hubs(adj, xc, y):
    if adj.hub_weights is not None:
        y = y + jnp.dot(adj.hub_weights, xc[adj.hub_ids].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    if adj.dst_hub_weights is not None:
        upd = jnp.dot(adj.dst_hub_weights, xc.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        y = y.at[adj.dst_hub_ids].add(upd)
    return y


def apply_shaped(adj, x):
    xc = x.astype(jnp.bfloat16)
    outs = []
    for nbr, w in zip(adj.bucket_nbrs, adj.bucket_weights):
        xg = xc[nbr]
        outs.append(jnp.sum((xg * w.astype(jnp.bfloat16)[..., None]).astype(jnp.float32), 1))
    y = jnp.concatenate(outs, 0)[adj.inv_perm]
    return apply_hubs(adj, xc, y).astype(x.dtype)


def apply_flat(adj, x):
    xc = x.astype(jnp.bfloat16)
    outs = []
    for nbr, w in zip(adj.bucket_nbrs, adj.bucket_weights):
        n_b, cap = nbr.shape
        xg = xc[nbr.reshape(-1)].reshape(n_b, cap, -1)
        outs.append(jnp.sum((xg * w.astype(jnp.bfloat16)[..., None]).astype(jnp.float32), 1))
    y = jnp.concatenate(outs, 0)[adj.inv_perm]
    return apply_hubs(adj, xc, y).astype(x.dtype)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=29, seed=0)
    g = ds.graph
    src = np.asarray(g.norm_edges.src)
    dst = np.asarray(g.norm_edges.dst)
    w = np.asarray(g.norm_edges.weight)
    nn = g.num_nodes
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((nn, 64)).astype(np.float32))

    for dh in (1024, 0):
        adj = build_padded_adj(src, dst, w, nn, hub_count=1024, dst_hub_count=dh,
                               num_src=nn, hub_mem_budget=4 * 1024**3)
        pair = PaddedAdjPair(fwd=adj, bwd=adj)
        for name, fn in (("shaped", apply_shaped), ("flat", apply_flat)):
            dt = per_op(
                lambda R, fn=fn: jax.jit(
                    lambda p, x, i: lax.fori_loop(
                        0, R, lambda _, y: fn(p.fwd, y), x + jnp.float32(i)
                    )
                ),
                lambda i: (pair, x64, i),
            )
            log(bench="flatrow", dst_hub=dh, variant=name, fwd_ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
