"""Weighted edge sampling (--sample_pow path) only: edge->user recovery as a
log2(nnz)-deep dependent searchsorted chain vs one flat user_pos_row gather.
Standalone because the full sampler_bench ladder exceeds the chip-run budget.
"""

from __future__ import annotations

import dataclasses as _dc
import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import sample_bpr  # noqa: E402
from furusato_recommend_tpu.sampling.weights import (  # noqa: E402
    edge_alias_from_weights,
    popularity_positive_edge_weights,
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


def per_op(make_prog, make_arg, r1=1, r2=5, iters=3):
    f1, f2 = make_prog(r1), make_prog(r2)
    t1 = timeit(f1, make_arg, iters=iters)
    t2 = timeit(f2, make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    N = 1_500_000
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    g = ds.graph

    def rep_prog(body):
        def make(R):
            def run(key, i):
                k0 = jax.random.fold_in(key, i)

                def step(c, _):
                    k, acc = c
                    k = jax.random.fold_in(k, acc & 1)
                    out = body(k)
                    return (k, out.reshape(-1)[0].astype(jnp.int32)), None

                (k, acc), _ = lax.scan(step, (k0, jnp.int32(0)), None, length=R)
                return acc

            return jax.jit(run)

        return make

    key = jax.random.PRNGKey(0)
    ea = edge_alias_from_weights(popularity_positive_edge_weights(ds, 0.5))
    g_norow = _dc.replace(g, user_pos_row=None)
    for variant, gg in (("edge_alias_flat_row", g), ("edge_alias_searchsorted", g_norow)):
        body = lambda k, gg=gg: sample_bpr(k, gg, N, neg_candidates=4, edge_alias=ea).neg
        dt = per_op(rep_prog(body), lambda i: (key, i))
        log(bench="sampler", variant=variant, K=4, ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
