"""BPR sampler perf probes on the real TPU chip.

At the bench.py shape (1.5M triplets/epoch) the on-device sampler costs ~0.9 s
(PERF.md) — after the dst-hub SpMM win that is ~1/3 of the whole epoch. This
script decomposes sample_bpr by elimination: RNG draws alone, membership test
alone, candidate-width and search-depth ladders.

Dev script (one JSON line per measurement); timing uses the in-program
repetition trick from spmm_bench.py (the tunnel's block_until_ready is broken,
see CLAUDE.md). Run from the repo root: python benchmarks/sampler_bench.py
"""

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
from furusato_recommend_tpu.ops.csr_search import csr_contains, lower_bound  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import sample_bpr  # noqa: E402

_RPC_BASELINE = None


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


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


def timeit(fn, make_arg, iters=5):
    base = rpc_baseline()
    out = fn(*make_arg(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_arg(1 + i))
    _sync(out)
    dt = time.perf_counter() - t0
    return max(dt - base, 1e-9) / iters


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
    log(bench="start", max_user_degree=int(g.max_user_degree))

    def rep_prog(body):
        """body(key) -> array; chained R times with key folding (data dependence
        via xor of previous output so XLA cannot hoist)."""

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

    # 1. full sampler, K ladder: cuckoo membership (default) vs CSR binary search
    import dataclasses as _dc

    g_csr = _dc.replace(g, pos_hash=None)
    for variant, gg in (("full_cuckoo", g), ("full_csr", g_csr)):
        for K in (4, 2, 1):
            body = lambda k, K=K, gg=gg: sample_bpr(k, gg, N, neg_candidates=K).neg
            dt = per_op(rep_prog(body), lambda i: (key, i))
            log(bench="sampler", variant=variant, K=K, ms=round(dt * 1e3, 1))

    # 2. RNG draws only (user + pos-offset + candidates)
    def rng_only(k):
        k1, k2, k3 = jax.random.split(k, 3)
        u = jax.random.randint(k1, (N,), 0, g.n_users)
        r = jax.random.randint(k2, (N,), 0, 1 << 30)
        c = jax.random.randint(k3, (N, 4), 0, g.m_items)
        return u + r + c[:, 0]

    dt = per_op(rep_prog(rng_only), lambda i: (key, i))
    log(bench="sampler", variant="rng_only", ms=round(dt * 1e3, 1))

    # 3. user+pos draw without membership test (K candidates drawn, first taken)
    def no_membership(k):
        k1, k2, k3 = jax.random.split(k, 3)
        csr = g.user_pos
        nnz = csr.indices.shape[0]
        u = jax.random.randint(k1, (N,), 0, g.n_users)
        start = csr.indptr[u]
        deg = csr.indptr[u + 1] - start
        r = jax.random.randint(k2, (N,), 0, 1 << 30) % jnp.maximum(deg, 1)
        pos = csr.indices[jnp.clip(start + r, 0, nnz - 1)]
        cand = jax.random.randint(k3, (N, 4), 0, g.m_items)
        return pos + cand[:, 0]

    dt = per_op(rep_prog(no_membership), lambda i: (key, i))
    log(bench="sampler", variant="no_membership", ms=round(dt * 1e3, 1))

    # 4. membership test alone, depth ladder ([N, K] probes)
    rng = np.random.default_rng(0)
    u_fix = jnp.asarray(rng.integers(0, g.n_users, N).astype(np.int32))
    for K in (4, 1):
        cand_fix = jnp.asarray(rng.integers(0, g.m_items, (N, K)).astype(np.int32))
        for iters_ in (int(g.max_user_degree).bit_length(), 8, 4):
            def member(k, K=K, it=iters_):
                # vary vals with the key so nothing caches
                off = jax.random.randint(k, (1,), 0, 4)
                vals = (cand_fix + off) % g.m_items
                csr = g.user_pos
                lo = csr.indptr[u_fix[:, None]]
                hi = csr.indptr[u_fix[:, None] + 1]
                p = lower_bound(csr.indices, lo, hi, vals, iters=it)
                return jnp.sum(p, axis=1)

            dt = per_op(rep_prog(member), lambda i: (key, i))
            log(bench="sampler", variant="membership", K=K, iters=iters_, ms=round(dt * 1e3, 1))

    # 5. weighted edge sampling (--sample_pow path): edge->user recovery as the
    # log2(nnz)-deep dependent searchsorted chain vs one flat user_pos_row gather
    from furusato_recommend_tpu.sampling.weights import (  # noqa: E402
        edge_alias_from_weights,
        popularity_positive_edge_weights,
    )

    ea = edge_alias_from_weights(popularity_positive_edge_weights(ds, 0.5))
    g_norow = _dc.replace(g, user_pos_row=None)
    for variant, gg in (("edge_alias_flat_row", g), ("edge_alias_searchsorted", g_norow)):
        body = lambda k, gg=gg: sample_bpr(k, gg, N, neg_candidates=4, edge_alias=ea).neg
        dt = per_op(rep_prog(body), lambda i: (key, i))
        log(bench="sampler", variant=variant, K=4, ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
