"""Probe: binary-search membership cost vs flat-array size.

sampler_bench showed [1.5M] searches run ~2 ns/probe but [6M] runs ~7 ns/probe
even after flattening — hypothesis: the fori_loop carries (lo, hi, vals ~ 3x4B
per element) stay VMEM-resident below ~1.3M elements and spill above. If so,
chunking one big search into python-unrolled sub-searches restores the fast
rate. One JSON line per measurement."""

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
from furusato_recommend_tpu.ops.csr_search import lower_bound  # noqa: E402

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
    t1 = timeit(make_prog(r1), make_arg, iters=iters)
    t2 = timeit(make_prog(r2), make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    csr = ds.graph.user_pos
    rng = np.random.default_rng(0)
    ITERS = 6

    def member_prog(S, chunk):
        u = jnp.asarray(rng.integers(0, ds.graph.n_users, S).astype(np.int32))
        v = jnp.asarray(rng.integers(0, ds.graph.m_items, S).astype(np.int32))

        def one(vals):
            lo = csr.indptr[u]
            hi = csr.indptr[u + 1]
            if chunk and S > chunk:
                outs = []
                for off in range(0, S, chunk):
                    sl = slice(off, min(off + chunk, S))
                    outs.append(
                        lower_bound(csr.indices, lo[sl], hi[sl], vals[sl], iters=ITERS)
                    )
                return jnp.concatenate(outs)
            return lower_bound(csr.indices, lo, hi, vals, iters=ITERS)

        def make(R):
            def run(i):
                def step(c, _):
                    p = one((v + c) % ds.graph.m_items)
                    return p[0].astype(jnp.int32), None

                acc, _ = lax.scan(step, jnp.int32(i), None, length=R)
                return acc

            return jax.jit(run)

        return make

    for S in (1_500_000, 3_000_000, 6_000_000):
        for chunk in (0, 768 * 1024, 1_500_000):
            dt = per_op(member_prog(S, chunk), lambda i: (i,))
            log(
                bench="chunked_member",
                size=S,
                chunk=chunk,
                ms=round(dt * 1e3, 1),
                ns_per_probe=round(dt / (S * ITERS) * 1e9, 2),
            )


if __name__ == "__main__":
    main()
